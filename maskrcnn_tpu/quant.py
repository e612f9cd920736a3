"""Post-training int8 quantization for the inference backbone + RPN.

The v5e MXU runs int8 at ~2x the bf16 rate (measured: 195.7 vs 131.5
TOP/s on the C4 3x3 conv shape) and int8 activations halve HBM traffic
on the bandwidth-bound C2/C3 stages (a full bottleneck chain with
requantization measures 1.31-1.38x over bf16 on chip). This module
quantizes the conv-heavy inference path — ResNet stages C2..C5, the FPN
neck, and the RPN shared 3x3 conv, together ~94% of the pipeline's
FLOPs — while keeping the stem, all geometry ops, and the box/mask
heads in the regular compute dtype. Opt-in via `Config.QUANT_INT8`;
inference-only (there is no quantized backward).

Scheme (standard symmetric PTQ):
* weights: per-output-channel scales `sw[c] = max|W[..., c]| / 127`,
  folded-BN kernels (checkpoint.fold.fold_bn_params) so the affine is
  inside the quantized kernel;
* activations: per-tensor scales `sx = amax / 127`, calibrated by
  running the float model over user-supplied images and recording the
  max-abs input of every quantized conv (ReLU outputs are one-sided, so
  this is effectively 7-bit — the standard trade for symmetric kernels);
* conv: int8 x int8 -> int32 on the MXU, dequantized in the epilogue
  `y = y32 * (sx * sw) + bias` (f32), ReLU, cast to the compute dtype.
  Residual adds and the top-down FPN adds stay in the compute dtype.

The forward here is a functional twin of models/{resnet,fpn,rpn}.py
(reference architecture: model.py:174-270, 97-168, 582-649) with two
modes sharing one code path: `calib` runs the float convs (bit-equal to
the flax modules with FOLD_BN=True — asserted in tests/test_quant.py)
while recording activation stats; `int8` consumes the quantized tree.
Sharing the traversal means the quantized graph cannot structurally
diverge from the tested float one.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.checkpoint.fold import fold_bn_params
from maskrcnn_tpu.config import Config
from maskrcnn_tpu.ops.image import normalize_image

Params = Dict[str, Any]


class QT(NamedTuple):
    """A quantized tensor: int8 values + its (traced) f32 scale."""

    q: jnp.ndarray
    scale: jnp.ndarray


def quantize_tensor(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Symmetric per-tensor int8 quantization. ONE shared definition so
    every emission of the same (x, scale) pair builds the identical
    subgraph and XLA CSEs them — the RPN's per-level feature quantize
    and the int8 RoIAlign table (ops/roi_align_pallas) reuse one
    materialization this way."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / scale)),
                    -127.0, 127.0).astype(jnp.int8)


@dataclasses.dataclass
class _Ctx:
    """Shared traversal state for the calib (float) / int8 modes."""

    mode: str                      # "calib" | "int8"
    dtype: Any                     # compute dtype for float tensors
    fp: Optional[Params] = None    # calib: folded float fpn tree
    tree: Optional[Params] = None  # int8: {"convs", "acts", "stem"}
    stats: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # calib: also record a strided |x| subsample of ~this many elements
    # per tensor (0 = amax only) — feeds the percentile / MSE clip
    # search in `calibrate` (Config.QUANT_CALIB)
    calib_sample: int = 0

    # -- activation quantization ------------------------------------
    def qt(self, name: str, x: jnp.ndarray):
        """Quantize tensor `x` (int8 mode) or record its stats (calib).

        int8 mode: a name absent from the acts tree means its consumer
        conv is in a Config.QUANT_SKIP group — the tensor passes
        through float and `conv` takes its float fallback path.
        """
        if self.mode == "calib":
            ax = jnp.abs(x.astype(jnp.float32))
            amax = jnp.max(ax)
            if self.calib_sample > 0:
                flat = ax.ravel()
                stride = max(1, flat.shape[0] // self.calib_sample)
                self.stats[name] = {"amax": amax,
                                    "sample": flat[::stride]}
            else:
                self.stats[name] = amax
            return x
        if name not in self.tree["acts"]:
            return x
        s = self.tree["acts"][name]
        return QT(quantize_tensor(x, s), s)

    # -- conv --------------------------------------------------------
    def conv(self, path: str, x, strides=(1, 1), padding=((0, 0), (0, 0)),
             relu: bool = False, fp_override: Optional[Params] = None):
        """One (possibly quantized) conv + bias (+ ReLU).

        `x` is a QT in int8 mode, a float tensor in calib mode. In int8
        mode a FLOAT `x` (its qt name is in a QUANT_SKIP group) runs the
        float conv from the tree's `convs_fp` entry instead.
        `fp_override` supplies float weights living outside the fpn tree
        (the RPN shared conv) in calib mode and for skipped groups.
        """
        dn = ("NHWC", "HWIO", "NHWC")
        if self.mode == "calib" or not isinstance(x, QT):
            if self.mode == "calib":
                p = (fp_override if fp_override is not None
                     else _get(self.fp, path))
            else:
                p = (self.tree.get("convs_fp", {}).get(path)
                     or fp_override)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), p["kernel"].astype(self.dtype),
                strides, padding, dimension_numbers=dn)
            y = y + p["bias"].astype(self.dtype)
        else:
            e = self.tree["convs"][path]
            y32 = jax.lax.conv_general_dilated(
                x.q, e["kernel"], strides, padding, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            y = y32.astype(jnp.float32) * (x.scale * e["kscale"]) + e["bias"]
            y = y.astype(self.dtype)
        return jax.nn.relu(y) if relu else y

    def float_conv(self, entry: Params, x, strides=(1, 1),
                   padding=((0, 0), (0, 0))):
        """Unquantized conv from an explicit {kernel, bias} entry."""
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), entry["kernel"].astype(self.dtype),
            strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + entry["bias"].astype(self.dtype)


def _get(tree: Params, path: str) -> Params:
    for k in path.split("/"):
        tree = tree[k]
    return tree


# shared with the flax neck — ONE source for the op the bit-exactness
# guarantee depends on
from maskrcnn_tpu.models.fpn import nearest_upsample_2x as _nearest_up2


def _bottleneck(ctx: _Ctx, path: str, x, stride: int, downsample: bool):
    """models/resnet.py Bottleneck with folded BN (model.py:174-211)."""
    xq = ctx.qt(f"{path}/in", x)
    s = (stride, stride)
    o = ctx.conv(f"{path}/conv1", xq, strides=s, relu=True)
    o = ctx.conv(f"{path}/conv2", ctx.qt(f"{path}/a1", o),
                 padding=((1, 1), (1, 1)), relu=True)
    o = ctx.conv(f"{path}/conv3", ctx.qt(f"{path}/a2", o))
    if downsample:
        residual = ctx.conv(f"{path}/downsample_conv", xq, strides=s)
    else:
        residual = x
    return jax.nn.relu(o + residual)


def _stage(ctx: _Ctx, path: str, x, blocks: int, stride: int):
    x = _bottleneck(ctx, f"{path}/block0", x, stride, downsample=True)
    for i in range(1, blocks):
        x = _bottleneck(ctx, f"{path}/block{i}", x, 1, downsample=False)
    return x


def _stem_entry(ctx: _Ctx) -> Params:
    if ctx.mode == "calib":
        return _get(ctx.fp, "resnet/C1_conv")
    return ctx.tree["stem"]


def fpn_forward(config: Config, ctx: _Ctx, x: jnp.ndarray):
    """ResNet + FPN neck, calib/int8 dual-mode. Returns [P2..P6]."""
    blocks4 = {"resnet50": 6, "resnet101": 23}[config.BACKBONE]

    # C1 stem stays float: 3 input channels use 3 of 128 MXU lanes, the
    # stage is bandwidth-bound, and its input scale is the image range.
    x = jax.nn.relu(ctx.float_conv(_stem_entry(ctx), x, strides=(2, 2),
                                   padding=((3, 3), (3, 3))))
    c1 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))

    c2 = _stage(ctx, "resnet/C2", c1, 3, 1)
    c3 = _stage(ctx, "resnet/C3", c2, 4, 2)
    c4 = _stage(ctx, "resnet/C4", c3, blocks4, 2)
    c5 = _stage(ctx, "resnet/C5", c4, 3, 2)

    p5 = ctx.conv("P5_conv1", ctx.qt("C5_out", c5))
    p4 = ctx.conv("P4_conv1", ctx.qt("C4_out", c4)) + _nearest_up2(p5)
    p3 = ctx.conv("P3_conv1", ctx.qt("C3_out", c3)) + _nearest_up2(p4)
    p2 = ctx.conv("P2_conv1", ctx.qt("C2_out", c2)) + _nearest_up2(p3)

    pad = ((1, 1), (1, 1))
    p5s = ctx.conv("P5_conv2", ctx.qt("P5_pre", p5), padding=pad)
    p4s = ctx.conv("P4_conv2", ctx.qt("P4_pre", p4), padding=pad)
    p3s = ctx.conv("P3_conv2", ctx.qt("P3_pre", p3), padding=pad)
    p2s = ctx.conv("P2_conv2", ctx.qt("P2_pre", p2), padding=pad)
    p6 = p5s[:, ::2, ::2, :]
    return [p2s, p3s, p4s, p5s, p6]


def mask_head_forward(config: Config, ctx: _Ctx, pooled: jnp.ndarray,
                      fp_mh: Optional[Params] = None) -> jnp.ndarray:
    """models/heads.py MaskHead with int8 conv1..4 (reference:
    model.py:848-920). The deconv and the per-class 1x1 stay float:
    they feed the sigmoid mask probabilities directly (the 0.5 contour
    is the AP-sensitive surface) and together are <15% of the head's
    FLOPs. Gate: int8 mask conv stack measured 0.65x bf16 at the
    production shape (benchmarks/gates/int8_heads_gate.py); the box
    head measured 1.25x (quantize-on-entry swamps the MXU saving on
    its bandwidth-heavy [N, 12544] matmul) and stays float.

    pooled: [N, 14, 14, C] float. fp_mh: folded float mask-head tree
    (calib mode only; int8 mode reads ctx.tree).
    """
    pad = ((1, 1), (1, 1))
    x = pooled.astype(ctx.dtype)
    for i in range(1, 5):
        xq = ctx.qt(f"mask_head/a{i - 1}", x)
        ov = fp_mh[f"conv{i}"] if ctx.mode == "calib" else None
        x = ctx.conv(f"mask_head/conv{i}", xq, padding=pad, relu=True,
                     fp_override=ov)
    fp = fp_mh if ctx.mode == "calib" else ctx.tree["mask_head_fp"]
    # DeconvK2S2 (models/common.py): matmul + depth-to-space, exact.
    dk = fp["deconv"]["kernel"].astype(ctx.dtype)       # [2, 2, O, I]
    y = jnp.einsum("nhwi,aboi->nhawbo", x.astype(ctx.dtype), dk)
    n, hh, _, ww, _, o = y.shape
    y = (y.reshape(n, 2 * hh, 2 * ww, o)
         + fp["deconv"]["bias"].astype(ctx.dtype))
    y = jax.nn.relu(y)
    y = jax.lax.conv_general_dilated(
        y, fp["conv5"]["kernel"].astype(ctx.dtype), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + fp["conv5"]["bias"].astype(ctx.dtype)
    return jax.nn.sigmoid(y.astype(jnp.float32))


_MASK_HEAD_ACTS = tuple(f"mask_head/a{i}" for i in range(4))


def rpn_scores_forward(config: Config, ctx: _Ctx, rpn_params: Params,
                       feature_maps: Sequence[jnp.ndarray]):
    """models/mask_rcnn.py rpn_scores with a quantized shared conv.

    The 18-channel fused class/bbox 1x1 stays float: it is ~0.2% of the
    RPN's FLOPs and feeds score/delta geometry directly.
    """
    dt = jnp.dtype(config.COMPUTE_DTYPE) if ctx.mode == "int8" else ctx.dtype
    a = len(config.RPN_ANCHOR_RATIOS)
    s = config.RPN_ANCHOR_STRIDE
    kf = jnp.concatenate([rpn_params["conv_class"]["kernel"],
                          rpn_params["conv_bbox"]["kernel"]],
                         axis=-1).astype(dt)
    bf = jnp.concatenate([rpn_params["conv_class"]["bias"],
                          rpn_params["conv_bbox"]["bias"]],
                         axis=-1).astype(dt)
    dn = ("NHWC", "HWIO", "NHWC")
    scores_l, deltas_l = [], []
    for i, f in enumerate(feature_maps):
        shared = ctx.conv(
            "rpn/conv_shared", ctx.qt(f"rpn/P{i}", f),
            strides=(s, s), padding=((1, 1), (1, 1)), relu=True,
            fp_override=rpn_params["conv_shared"])
        y = jax.lax.conv_general_dilated(
            shared.astype(dt), kf, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=dn) + bf
        b = y.shape[0]
        cls = y[..., :2 * a].reshape(b, -1, 2)
        box = y[..., 2 * a:].reshape(b, -1, 4)
        scores_l.append(jax.nn.sigmoid(
            (cls[..., 1] - cls[..., 0]).astype(jnp.float32)))
        deltas_l.append(box)
    return (jnp.concatenate(scores_l, axis=1),
            jnp.concatenate(deltas_l, axis=1))


# ---------------------------------------------------------------------
# quantization (host-side, numpy)
# ---------------------------------------------------------------------

def _conv_paths(config: Config):
    """Every quantized conv path in traversal order."""
    blocks = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}
    paths = []
    for stage, n in zip(("C2", "C3", "C4", "C5"), blocks[config.BACKBONE]):
        for b in range(n):
            base = f"resnet/{stage}/block{b}"
            paths += [f"{base}/conv1", f"{base}/conv2", f"{base}/conv3"]
            if b == 0:
                paths.append(f"{base}/downsample_conv")
    paths += [f"P{i}_conv{j}" for i in (2, 3, 4, 5) for j in (1, 2)]
    return paths


def _group_of(name: str) -> str:
    """Map a conv path OR activation name to its Config.QUANT_SKIP
    stage group. Activation names group by their CONSUMING conv:
    C{i}_out / P{i}_pre feed the FPN lateral/smoothing convs."""
    if name.startswith("resnet/"):
        return name.split("/")[1]            # C2..C5
    if name.startswith("rpn/"):
        return "RPN"
    if name.startswith("mask_head/"):
        return "MASK"
    return "FPN"                             # P*_conv*, C*_out, P*_pre


def _search_clip(amax: float, sample: np.ndarray, method: str,
                 percentile: float) -> float:
    """Pick the activation clip value for one tensor.

    sample: pooled |x| subsample across calibration batches (one-sided;
    ReLU inputs dominate and symmetric int8 treats |x| anyway).
    "percentile": the p-th percentile of |x| — outlier-robust.
    "mse": grid search (64 log-spaced candidates in [amax/50, amax])
    minimizing quantization MSE on the subsample — the standard
    TensorRT-style calibration, cheap because it runs on a subsample.
    """
    amax = max(float(amax), 1e-6)
    if method == "percentile":
        # floor at amax/50: a near-empty (ReLU-sparse) tensor's
        # percentile can be ~0, which would saturate EVERY nonzero
        # activation — cap the implied saturation range instead
        return max(float(np.percentile(sample, percentile)),
                   amax / 50.0, 1e-6)
    assert method == "mse", method
    if sample.size > 65536:  # grid cost is candidates x samples
        sample = sample[:: sample.size // 65536 + 1]
    cands = np.geomspace(amax / 50.0, amax, 32).astype(np.float32)
    s = cands / 127.0                                   # [C]
    q = np.clip(np.round(sample[None, :] / s[:, None]), 0, 127) * s[:, None]
    mse = np.mean((sample[None, :] - q) ** 2, axis=1)   # [C]
    return max(float(cands[int(np.argmin(mse))]), 1e-6)


def _quantize_kernel(entry: Params) -> Params:
    k = np.asarray(entry["kernel"], np.float32)
    amax = np.maximum(np.max(np.abs(k), axis=(0, 1, 2)), 1e-8)  # [O]
    sw = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(k / sw), -127, 127).astype(np.int8)
    return {"kernel": jnp.asarray(q), "kscale": jnp.asarray(sw),
            "bias": jnp.asarray(np.asarray(entry["bias"], np.float32))}


def _calib_sample_size(config: Config) -> int:
    """Subsample size per tensor per calibration step: 0 (amax-only)
    unless the clip search needs a distribution. 16k/tensor/batch is
    plenty for a 32-candidate clip grid and keeps the host fetch and
    search cheap."""
    return 0 if config.QUANT_CALIB == "amax" else 16384


def _calib_step(model, folded_fpn: Params, rpn_params: Params,
                images: jnp.ndarray):
    """One jitted calibration forward; returns activation stats
    (amax scalars, plus |x| subsamples for percentile/mse calib)."""
    cfg = model.config
    ctx = _Ctx(mode="calib", dtype=jnp.dtype(cfg.COMPUTE_DTYPE),
               fp=folded_fpn, calib_sample=_calib_sample_size(cfg))
    x = normalize_image(images, cfg.MEAN_PIXEL)
    feats = fpn_forward(cfg, ctx, x)
    rpn_scores_forward(cfg, ctx, rpn_params, feats)
    return ctx.stats


def default_calib_canvases(image_shape, n: int = 4,
                           seed: int = 0) -> np.ndarray:
    """Synthetic gradient+texture canvases spanning the uint8 range —
    the shared fallback calibration set (Detector, bench.py,
    benchmarks/breakdown.py). Fine for benchmarking; real frames give
    tighter scales."""
    ch, cw = int(image_shape[0]), int(image_shape[1])
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:ch, 0:cw]
    base = ((yy[..., None] * 255 // max(ch - 1, 1))
            + (xx[..., None] * 255 // max(cw - 1, 1))) // 2
    imgs = [np.clip(base + rng.randint(-60, 60, (ch, cw, 3)), 0, 255)
            for _ in range(n)]
    return np.asarray(imgs, np.uint8)


def params_fingerprint(params: Params) -> str:
    """Cheap content fingerprint for calibration-cache keying: per-leaf
    (sum, sum|x|) over a structured sample of kernels spanning the
    quantized subgraph (stem, first/last backbone convs, neck, RPN).
    Sampled rather than whole-tree so it stays cheap when the params
    live behind a slow device link."""
    paths = [("fpn", "resnet", "C1_conv", "kernel"),
             ("fpn", "resnet", "C2", "block0", "conv1", "kernel"),
             ("fpn", "resnet", "C5", "block2", "conv3", "kernel"),
             ("fpn", "P2_conv2", "kernel"),
             ("rpn", "conv_shared", "kernel")]
    parts = []
    for p in paths:
        leaf = params
        for k in p:
            leaf = leaf[k]
        a = np.asarray(leaf, np.float64)
        parts.append(f"{a.sum():.6e}:{np.abs(a).sum():.6e}")
    return "|".join(parts)


def _calib_heads_step(model, folded_mh: Params, params: Params,
                      images: jnp.ndarray, windows: jnp.ndarray):
    """One jitted head-calibration forward: run the FLOAT pipeline
    prefix to the mask-head RoIAlign (the exact pooled features
    production feeds the head), then the dual-mode mask head in calib
    mode. Returns its activation amax stats."""
    from maskrcnn_tpu.detection.pipeline import detect_and_pool_masks

    cfg = model.config
    _, pooled_m = detect_and_pool_masks(model, params, images, windows)
    b, d = pooled_m.shape[:2]
    ctx = _Ctx(mode="calib", dtype=jnp.dtype(cfg.COMPUTE_DTYPE),
               calib_sample=_calib_sample_size(cfg))
    mask_head_forward(cfg, ctx,
                      pooled_m.reshape(b * d, *pooled_m.shape[2:]),
                      fp_mh=folded_mh)
    return ctx.stats


def calibrate(model, params: Params, calib_images: np.ndarray,
              batch_size: int = 4, heads: bool = True) -> Dict[str, float]:
    """Run the float model over calibration canvases; return per-tensor
    activation CLIP values {path: float} (scale = clip/127).

    Config.QUANT_CALIB picks the clip rule: "amax" returns the running
    max-abs (the r4 behavior — one outlier sets the whole scale);
    "percentile"/"mse" pool an |x| subsample across batches and search
    the clip that saturates the outlier tail (_search_clip). The
    returned dict is JSON-serializable either way, so serving
    deployments can persist it (see prepare_quant_params' act_stats)
    instead of re-running calibration at every startup."""
    cfg = model.config
    calib_images = np.asarray(calib_images)
    assert calib_images.ndim == 4 and calib_images.shape[0] >= 1
    want = tuple(cfg.IMAGE_SHAPE[:2])
    got = calib_images.shape[1:3]
    assert got == want, (
        f"calib canvases are {got}, config.IMAGE_SHAPE wants {want} — "
        "resize+pad calibration frames exactly like inference inputs")
    folded = fold_bn_params(params["fpn"])
    step = jax.jit(functools.partial(_calib_step, model))
    if heads:
        folded_mh = fold_bn_params(params["mask_head"])
        hstep = jax.jit(functools.partial(_calib_heads_step, model,
                                          folded_mh))
        ch, cw = want
        win = np.tile([[0.0, 0.0, ch, cw]],
                      (batch_size, 1)).astype(np.float32)
    sampled = _calib_sample_size(cfg) > 0
    amaxes: Dict[str, float] = {}
    samples: Dict[str, list] = {}
    for i in range(0, calib_images.shape[0], batch_size):
        batch = jnp.asarray(calib_images[i:i + batch_size])
        out = jax.device_get(step(folded, params["rpn"], batch))
        if heads:
            hout = jax.device_get(hstep(
                params, batch, jnp.asarray(win[:batch.shape[0]])))
            out = dict(out, **hout)
        for k, v in out.items():
            if sampled:
                amaxes[k] = max(amaxes.get(k, 0.0), float(v["amax"]))
                samples.setdefault(k, []).append(np.asarray(v["sample"]))
            else:
                amaxes[k] = max(amaxes.get(k, 0.0), float(v))
    if not sampled:
        return amaxes
    stats: Dict[str, float] = {}
    rng = np.random.RandomState(0)
    for k, amax in amaxes.items():
        pool = np.concatenate(samples[k])
        if pool.size > 262144:  # bound the mse grid's host memory
            pool = pool[rng.choice(pool.size, 262144, replace=False)]
        stats[k] = _search_clip(amax, pool, cfg.QUANT_CALIB,
                                cfg.QUANT_PERCENTILE)
    return stats


def prepare_quant_params(model, params: Params,
                         calib_images: Optional[np.ndarray] = None,
                         batch_size: int = 4,
                         act_stats: Optional[Dict[str, float]] = None
                         ) -> Params:
    """Calibrate + quantize. Returns the inference param tree for a
    `Config.QUANT_INT8=True` pipeline.

    calib_images: [N, H, W, 3] uint8 resized+padded canvases (the same
    distribution `predict_step` will see). A handful of representative
    frames is enough for per-tensor amax calibration. Alternatively
    pass `act_stats` (the dict `calibrate` returns, e.g. loaded from a
    JSON persisted at a previous startup) to skip the calibration
    forward entirely.

    The returned tree keeps the float box/mask heads and RPN 1x1s and
    REPLACES the float fpn subtree with the quantized one (int8 kernels
    are 4x smaller in HBM than f32).
    """
    if act_stats is None:
        assert calib_images is not None, \
            "pass calib_images or precomputed act_stats"
        act_stats = calibrate(model, params, calib_images, batch_size)
    skip = set(model.config.QUANT_SKIP)
    assert skip <= {"C2", "C3", "C4", "C5", "FPN", "RPN", "MASK"}, skip
    folded = fold_bn_params(params["fpn"])
    acts = {k: jnp.float32(max(v, 1e-6) / 127.0)
            for k, v in act_stats.items() if _group_of(k) not in skip}

    def _float_entry(entry: Params) -> Params:
        return {"kernel": jnp.asarray(np.asarray(entry["kernel"],
                                                 np.float32)),
                "bias": jnp.asarray(np.asarray(entry["bias"],
                                               np.float32))}

    convs, convs_fp = {}, {}
    for p in _conv_paths(model.config):
        if _group_of(p) in skip:
            convs_fp[p] = _float_entry(_get(folded, p))
        else:
            convs[p] = _quantize_kernel(_get(folded, p))
    if "RPN" not in skip:
        convs["rpn/conv_shared"] = _quantize_kernel(
            params["rpn"]["conv_shared"])
    # (a skipped RPN needs no convs_fp entry: rpn_scores_forward passes
    # the float kernel as fp_override)
    stem = _get(folded, "resnet/C1_conv")
    quant_tree = {
        "convs": convs,
        "convs_fp": convs_fp,
        "acts": acts,
        "stem": _float_entry(stem),
    }
    # Mask head conv1..4 int8 (deconv/conv5 float; see
    # mask_head_forward). Head activation stats exist only if
    # calibration ran the heads path; act_stats persisted by an older
    # deployment may lack them — then the mask head silently stays
    # float (predict_masks routes by key presence) rather than failing.
    if all(k in act_stats for k in _MASK_HEAD_ACTS) and "MASK" not in skip:
        folded_mh = fold_bn_params(params["mask_head"])
        for i in (1, 2, 3, 4):
            convs[f"mask_head/conv{i}"] = _quantize_kernel(
                folded_mh[f"conv{i}"])
        quant_tree["mask_head_fp"] = {
            name: _float_entry(folded_mh[name])
            for name in ("deconv", "conv5")}
    out = {
        "quant": quant_tree,
        "rpn": params["rpn"],
        "box_head": params["box_head"],
        "mask_head": params["mask_head"],
    }
    if "kp_head" in params:
        # keypoint branch stays float (bandwidth-light head on pooled
        # RoIs; same reasoning as the float box head — int8_heads_gate)
        out["kp_head"] = params["kp_head"]
    for k in params:
        if k.startswith("box_head") and k not in out:
            # cascade stage heads stay float like the base box head
            out[k] = params[k]
    return out


# -- jit-callable int8 entry points (used by MaskRCNN routing) --------

def quant_backbone(config: Config, quant_tree: Params, x: jnp.ndarray):
    ctx = _Ctx(mode="int8", dtype=jnp.dtype(config.COMPUTE_DTYPE),
               tree=quant_tree)
    return fpn_forward(config, ctx, x)


def quant_rpn_scores(config: Config, quant_tree: Params,
                     rpn_params: Params, feats: Sequence[jnp.ndarray]):
    ctx = _Ctx(mode="int8", dtype=jnp.dtype(config.COMPUTE_DTYPE),
               tree=quant_tree)
    return rpn_scores_forward(config, ctx, rpn_params, feats)


def quant_mask_head(config: Config, quant_tree: Params,
                    pooled: jnp.ndarray) -> jnp.ndarray:
    ctx = _Ctx(mode="int8", dtype=jnp.dtype(config.COMPUTE_DTYPE),
               tree=quant_tree)
    return mask_head_forward(config, ctx, pooled)


# ---------------------------------------------------------------------
# RetinaNet variant (models/retina_fpn.py; reference fpn/retina_fpn.py)
# ---------------------------------------------------------------------

def _fold_retina_tree(fpn_params: Params, num_blocks) -> Params:
    """Fold FrozenBatchNorm into the retina convs (bias-free convs get a
    synthesized bias = BN offset). Returns a nested {kernel, bias} tree;
    BN-less convs (conv6/conv7/toplayer/latlayers/smooths) pass through.

    Unlike checkpoint.fold.fold_bn_params this changes the tree shape
    (adds biases), so it lives here: the quant tree is its own format.
    """
    def fold_pair(conv: Params, bn: Params) -> Params:
        scale = np.asarray(bn["weight"], np.float64) / np.sqrt(
            np.asarray(bn["running_var"], np.float64) + 1e-3)
        offset = (np.asarray(bn["bias"], np.float64)
                  - np.asarray(bn["running_mean"], np.float64) * scale)
        k = np.asarray(conv["kernel"], np.float64) * scale
        return {"kernel": jnp.asarray(k.astype(np.float32)),
                "bias": jnp.asarray(offset.astype(np.float32))}

    out: Params = {"conv1": fold_pair(fpn_params["conv1"],
                                      fpn_params["bn1"])}
    for li, (layer, n) in enumerate(zip(
            ("layer2", "layer3", "layer4", "layer5"), num_blocks)):
        for b in range(n):
            blk = fpn_params[f"{layer}_block{b}"]
            e = {f"conv{j}": fold_pair(blk[f"conv{j}"], blk[f"bn{j}"])
                 for j in (1, 2, 3)}
            if "shortcut_conv" in blk:
                e["shortcut_conv"] = fold_pair(blk["shortcut_conv"],
                                               blk["shortcut_bn"])
            out[f"{layer}_block{b}"] = e
    for name in ("conv6", "conv7", "toplayer", "latlayer1", "latlayer2",
                 "smooth1", "smooth2"):
        p = fpn_params[name]
        out[name] = {"kernel": jnp.asarray(np.asarray(p["kernel"],
                                                      np.float32)),
                     "bias": jnp.asarray(np.asarray(p["bias"],
                                                    np.float32))}
    return out


def _retina_block(ctx: _Ctx, path: str, x, stride: int):
    """models/retina_fpn.py RetinaBottleneck with folded BN (note the
    stride sits on the 3x3 conv2, unlike the main model)."""
    has_short = (ctx.fp is not None and "shortcut_conv" in _get(
        ctx.fp, path)) or (ctx.tree is not None and
                           f"{path}/shortcut_conv" in ctx.tree["convs"])
    xq = ctx.qt(f"{path}/in", x)
    o = ctx.conv(f"{path}/conv1", xq, relu=True)
    o = ctx.conv(f"{path}/conv2", ctx.qt(f"{path}/a1", o),
                 strides=(stride, stride), padding=((1, 1), (1, 1)),
                 relu=True)
    o = ctx.conv(f"{path}/conv3", ctx.qt(f"{path}/a2", o))
    if has_short:
        residual = ctx.conv(f"{path}/shortcut_conv", xq,
                            strides=(stride, stride))
    else:
        residual = x
    return jax.nn.relu(o + residual)


def retina_fpn_forward(config: Config, ctx: _Ctx, x: jnp.ndarray,
                       num_blocks=(2, 2, 2, 2)):
    """RetinaFPN P3..P7, calib/int8 dual-mode (retina_fpn.py:74-117)."""
    from maskrcnn_tpu.models.retina_fpn import bilinear_resize_2x

    x = jax.nn.relu(ctx.float_conv(_stem_entry_retina(ctx), x,
                                   strides=(2, 2),
                                   padding=((3, 3), (3, 3))))
    c1 = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def stage(x, layer, planes, n, stride):
        x = _retina_block(ctx, f"{layer}_block0", x, stride)
        for i in range(1, n):
            x = _retina_block(ctx, f"{layer}_block{i}", x, 1)
        return x

    c2 = stage(c1, "layer2", 64, num_blocks[0], 1)
    c3 = stage(c2, "layer3", 128, num_blocks[1], 2)
    c4 = stage(c3, "layer4", 256, num_blocks[2], 2)
    c5 = stage(c4, "layer5", 512, num_blocks[3], 2)

    pad = ((1, 1), (1, 1))
    p6 = ctx.conv("conv6", ctx.qt("c5_for_p6", c5), strides=(2, 2),
                  padding=pad)
    p7 = ctx.conv("conv7", ctx.qt("p6_relu", jax.nn.relu(p6)),
                  strides=(2, 2), padding=pad)
    p5 = ctx.conv("toplayer", ctx.qt("c5_top", c5))
    lat4 = ctx.conv("latlayer1", ctx.qt("c4_lat", c4))
    p4 = bilinear_resize_2x(p5, lat4.shape[1], lat4.shape[2]) + lat4
    lat3 = ctx.conv("latlayer2", ctx.qt("c3_lat", c3))
    p3 = bilinear_resize_2x(p4, lat3.shape[1], lat3.shape[2]) + lat3
    p4 = ctx.conv("smooth1", ctx.qt("p4_pre", p4), padding=pad)
    p3 = ctx.conv("smooth2", ctx.qt("p3_pre", p3), padding=pad)
    return [p3, p4, p5, p6, p7]


def _stem_entry_retina(ctx: _Ctx) -> Params:
    if ctx.mode == "calib":
        return _get(ctx.fp, "conv1")
    return ctx.tree["stem"]


def retina_head_forward(config: Config, ctx: _Ctx, head_params: Params,
                        feats):
    """Shared dense class+box towers (retina_fpn.py:120-144): the 8
    tower convs quantize with per-(layer, level) input scales; the
    cls_out/box_out logit convs stay float."""
    a = len(config.RPN_ANCHOR_RATIOS)
    k = config.NUM_CLASSES
    pad = ((1, 1), (1, 1))
    cls_l, box_l = [], []
    for l, f in enumerate(feats):
        cls = box = f
        for i in range(4):
            cls = ctx.conv(f"head/cls{i}", ctx.qt(f"head/cls{i}/P{l}",
                                                  cls),
                           padding=pad, relu=True,
                           fp_override=head_params[f"cls{i}"])
            box = ctx.conv(f"head/box{i}", ctx.qt(f"head/box{i}/P{l}",
                                                  box),
                           padding=pad, relu=True,
                           fp_override=head_params[f"box{i}"])
        cls = ctx.float_conv(head_params["cls_out"], cls, padding=pad)
        box = ctx.float_conv(head_params["box_out"], box, padding=pad)
        b = f.shape[0]
        cls_l.append(cls.reshape(b, -1, k).astype(jnp.float32))
        box_l.append(box.reshape(b, -1, 4).astype(jnp.float32))
    return (jnp.concatenate(cls_l, axis=1),
            jnp.concatenate(box_l, axis=1))


def _retina_conv_paths(num_blocks):
    paths = []
    for layer, n in zip(("layer2", "layer3", "layer4", "layer5"),
                        num_blocks):
        for b in range(n):
            base = f"{layer}_block{b}"
            paths += [f"{base}/conv{j}" for j in (1, 2, 3)]
            if b == 0:
                paths.append(f"{base}/shortcut_conv")
    paths += ["conv6", "conv7", "toplayer", "latlayer1", "latlayer2",
              "smooth1", "smooth2"]
    return paths


def _retina_calib_step(net, folded: Params, head_params: Params,
                       images: jnp.ndarray):
    cfg = net.config
    ctx = _Ctx(mode="calib", dtype=jnp.dtype(cfg.COMPUTE_DTYPE),
               fp=folded)
    x = normalize_image(images, cfg.MEAN_PIXEL)
    feats = retina_fpn_forward(cfg, ctx, x, net.fpn.num_blocks)
    retina_head_forward(cfg, ctx, head_params, feats)
    return ctx.stats


def prepare_retina_quant_params(net, params: Params,
                                calib_images: Optional[np.ndarray] = None,
                                batch_size: int = 4,
                                act_stats=None) -> Params:
    """RetinaNet analog of prepare_quant_params. `net` is a
    models.retina_fpn.RetinaNet; returns the QUANT_INT8 param tree."""
    cfg = net.config
    folded = _fold_retina_tree(params["fpn"], net.fpn.num_blocks)
    if act_stats is None:
        calib_images = np.asarray(calib_images)
        want = tuple(cfg.IMAGE_SHAPE[:2])
        assert calib_images.shape[1:3] == want, (
            calib_images.shape, want)
        step = jax.jit(functools.partial(_retina_calib_step, net))
        act_stats = {}
        for i in range(0, calib_images.shape[0], batch_size):
            batch = jnp.asarray(calib_images[i:i + batch_size])
            got = jax.device_get(step(folded, params["head"], batch))
            for kk, v in got.items():
                act_stats[kk] = max(act_stats.get(kk, 0.0), float(v))
    acts = {kk: jnp.float32(max(v, 1e-6) / 127.0)
            for kk, v in act_stats.items()}
    convs = {p: _quantize_kernel(_get(folded, p))
             for p in _retina_conv_paths(net.fpn.num_blocks)}
    for i in range(4):
        convs[f"head/cls{i}"] = _quantize_kernel(params["head"][f"cls{i}"])
        convs[f"head/box{i}"] = _quantize_kernel(params["head"][f"box{i}"])
    stem = folded["conv1"]
    return {
        "quant": {"convs": convs, "acts": acts,
                  "stem": {"kernel": stem["kernel"],
                           "bias": stem["bias"]}},
        "head": params["head"],
    }


def retina_quant_forward(config: Config, quant_tree: Params,
                         head_params: Params, images: jnp.ndarray,
                         num_blocks=(2, 2, 2, 2)):
    """int8 logits/deltas: RetinaNet.forward's quantized twin."""
    ctx = _Ctx(mode="int8", dtype=jnp.dtype(config.COMPUTE_DTYPE),
               tree=quant_tree)
    feats = retina_fpn_forward(config, ctx, images, num_blocks)
    return retina_head_forward(config, ctx, head_params, feats)
