"""Mask R-CNN model bundle: modules + parameter init + stage API.

The reference's `MaskRCNN(nn.Module)` orchestrator (reference:
model.py:959-1747) mixes parameters, device transfers, file IO and the
training loop in one class. Here the model is a plain bundle of pure
flax modules over one parameter pytree; pipelines (detection/, train/)
are functions of (model, params, inputs) that jit end-to-end.

The per-stage reference surface used by explore.py (fpn -> rpn_detect ->
rpn_refine -> mrn_detect -> mrn_refine, reference explore.py:67-105) stays
individually callable: see `backbone`, `rpn`, and detection/pipeline.py's
stage functions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.models.fpn import FPN
from maskrcnn_tpu.models.heads import BoxHead, KeypointHead, MaskHead
from maskrcnn_tpu.models.rpn import RPNHead
from maskrcnn_tpu.ops.anchors import config_anchors

Params = Dict[str, Any]


def _dtype(config: Config):
    return jnp.dtype(config.COMPUTE_DTYPE)


@dataclasses.dataclass(frozen=True)
class MaskRCNN:
    """Immutable model bundle; hashable so it can be a jit static arg."""

    config: Config

    @property
    def fpn(self) -> FPN:
        return FPN(architecture=self.config.BACKBONE,
                   dtype=_dtype(self.config),
                   remat=self.config.REMAT_BACKBONE,
                   fold_bn=self.config.FOLD_BN,
                   s2d_stem=self.config.S2D_STEM)

    @property
    def rpn(self) -> RPNHead:
        return RPNHead(
            anchors_per_location=len(self.config.RPN_ANCHOR_RATIOS),
            anchor_stride=self.config.RPN_ANCHOR_STRIDE,
            dtype=_dtype(self.config))

    @property
    def box_head(self) -> BoxHead:
        return BoxHead(num_classes=self.config.NUM_CLASSES,
                       pool_size=self.config.POOL_SIZE,
                       dtype=_dtype(self.config),
                       fold_bn=self.config.FOLD_BN)

    @property
    def mask_head(self) -> MaskHead:
        return MaskHead(num_classes=self.config.NUM_CLASSES,
                        dtype=_dtype(self.config),
                        fold_bn=self.config.FOLD_BN)

    @property
    def cascade_stages(self) -> int:
        """Number of box-head stages (1 = plain Mask R-CNN)."""
        return max(1, len(self.config.CASCADE_STAGES))

    @property
    def kp_head(self) -> KeypointHead:
        assert self.config.NUM_KEYPOINTS > 0
        return KeypointHead(num_keypoints=self.config.NUM_KEYPOINTS,
                            convs=self.config.KEYPOINT_HEAD_CONVS,
                            dim=self.config.KEYPOINT_HEAD_DIM,
                            dtype=_dtype(self.config))

    # ---- init ----
    def init(self, rng: jax.Array) -> Params:
        """Initialise all parameters (reference: model.py:974-1035).

        Jitted as one program: eager flax init would dispatch every
        primitive separately, which costs minutes of per-op compiles on
        a remote-compile TPU backend."""
        return jax.jit(self._init)(rng)

    def _init(self, rng: jax.Array) -> Params:
        cfg = self.config
        k_fpn, k_rpn, k_box, k_mask = jax.random.split(rng, 4)
        dummy = jnp.zeros((1,) + tuple(cfg.IMAGE_SHAPE), jnp.float32)
        fpn_params = self.fpn.init(k_fpn, dummy)
        p2 = jnp.zeros((1, cfg.BACKBONE_SHAPES[0][0],
                        cfg.BACKBONE_SHAPES[0][1], 256), jnp.float32)
        rpn_params = self.rpn.init(k_rpn, p2)
        pooled_box = jnp.zeros((1, cfg.POOL_SIZE, cfg.POOL_SIZE, 256),
                               jnp.float32)
        box_params = self.box_head.init(k_box, pooled_box)
        pooled_mask = jnp.zeros(
            (1, cfg.MASK_POOL_SIZE, cfg.MASK_POOL_SIZE, 256), jnp.float32)
        mask_params = self.mask_head.init(k_mask, pooled_mask)
        params = {
            "fpn": fpn_params["params"],
            "rpn": rpn_params["params"],
            "box_head": box_params["params"],
            "mask_head": mask_params["params"],
        }
        if cfg.NUM_KEYPOINTS > 0:
            # fold_in (not a wider split) so the two-head init stays
            # bit-identical to builds without the keypoint branch
            k_kp = jax.random.fold_in(rng, 17)
            params["kp_head"] = self.kp_head.init(
                k_kp, pooled_mask)["params"]
        for i in range(1, self.cascade_stages):
            # extra cascade box heads; fold_in keeps the base init
            # bit-identical to the single-head build
            k_i = jax.random.fold_in(rng, 100 + i)
            params[f"box_head{i + 1}"] = self.box_head.init(
                k_i, pooled_box)["params"]
        return params

    # ---- stage API ----
    def backbone(self, params: Params, images: jnp.ndarray) -> List:
        """images [B, H, W, 3] float32 -> [P2..P6] (model.py:1145).

        With Config.QUANT_INT8 and a quant.prepare_quant_params tree,
        routes through the int8 backbone (quant.py)."""
        if self.config.QUANT_INT8 and "quant" in params:
            from maskrcnn_tpu import quant
            return quant.quant_backbone(self.config, params["quant"],
                                        images)
        return self.fpn.apply({"params": params["fpn"]}, images)

    def rpn_detect(self, params: Params, feature_maps: Sequence):
        """All-level RPN outputs (model.py:1294-1304)."""
        outs = [self.rpn.apply({"params": params["rpn"]}, p)
                for p in feature_maps]
        logits = jnp.concatenate([o[0] for o in outs], axis=1)
        probs = jnp.concatenate([o[1] for o in outs], axis=1)
        bbox = jnp.concatenate([o[2] for o in outs], axis=1)
        return logits, probs, bbox

    def rpn_scores(self, params: Params, feature_maps: Sequence):
        """Inference-lean RPN: fg scores + deltas, same weights.

        Numerically equal to `rpn_detect` consumed as (probs[..., 1],
        bbox) — softmax over 2 logits IS sigmoid(l1 - l0) — but cheaper
        on TPU: the class/bbox 1x1 convs fuse into ONE 18-channel conv
        (one read of the 512-channel shared map instead of two), no
        [B, A, 2] probs materialize, and the deltas stay in the compute
        dtype until the proposal layer's top-k gather casts the 500
        survivors (the conv output is bf16 either way, so the early f32
        cast of all 261,888 rows carried no extra precision).
        Returns (scores [B, A] float32, deltas [B, A, 4] compute dtype).
        """
        cfg = self.config
        if cfg.QUANT_INT8 and "quant" in params:
            from maskrcnn_tpu import quant
            return quant.quant_rpn_scores(cfg, params["quant"],
                                          params["rpn"], feature_maps)
        dt = _dtype(cfg)
        rp = params["rpn"]
        ks = rp["conv_shared"]["kernel"].astype(dt)
        bs = rp["conv_shared"]["bias"].astype(dt)
        # one fused 1x1: [1, 1, 512, 2A + 4A] (class channels first)
        kf = jnp.concatenate([rp["conv_class"]["kernel"],
                              rp["conv_bbox"]["kernel"]],
                             axis=-1).astype(dt)
        bf = jnp.concatenate([rp["conv_class"]["bias"],
                              rp["conv_bbox"]["bias"]],
                             axis=-1).astype(dt)
        a = len(cfg.RPN_ANCHOR_RATIOS)
        s = cfg.RPN_ANCHOR_STRIDE
        dn = ("NHWC", "HWIO", "NHWC")
        scores_l, deltas_l = [], []
        for f in feature_maps:
            shared = jax.nn.relu(jax.lax.conv_general_dilated(
                f.astype(dt), ks, (s, s), [(1, 1), (1, 1)],
                dimension_numbers=dn) + bs)
            y = jax.lax.conv_general_dilated(
                shared, kf, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=dn) + bf
            b = y.shape[0]
            cls = y[..., :2 * a].reshape(b, -1, 2)
            box = y[..., 2 * a:].reshape(b, -1, 4)
            scores_l.append(jax.nn.sigmoid(
                (cls[..., 1] - cls[..., 0]).astype(jnp.float32)))
            deltas_l.append(box)
        return (jnp.concatenate(scores_l, axis=1),
                jnp.concatenate(deltas_l, axis=1))

    def classify(self, params: Params, pooled: jnp.ndarray):
        """Box head over pooled [N, 7, 7, 256] (model.py:759-800)."""
        return self.box_head.apply({"params": params["box_head"]}, pooled)

    def classify_stage(self, params: Params, pooled: jnp.ndarray,
                       stage: int):
        """Cascade stage box head (stage 0 = the base `box_head`)."""
        key = "box_head" if stage == 0 else f"box_head{stage + 1}"
        return self.box_head.apply({"params": params[key]}, pooled)

    def predict_masks(self, params: Params, pooled: jnp.ndarray):
        """Mask head over pooled [N, 14, 14, 256] (model.py:875-920).

        With QUANT_INT8 and a quant tree carrying mask-head entries
        (prepare_quant_params with head calibration), routes through
        the int8 conv stack (quant.mask_head_forward); older persisted
        act_stats without head keys fall back to the float head."""
        if self.config.QUANT_INT8 and "quant" in params and \
                "mask_head/conv1" in params["quant"]["convs"]:
            from maskrcnn_tpu import quant
            return quant.quant_mask_head(self.config, params["quant"],
                                         pooled)
        return self.mask_head.apply({"params": params["mask_head"]}, pooled)

    def predict_keypoints(self, params: Params, pooled: jnp.ndarray):
        """Keypoint head over pooled [N, 14, 14, 256] -> heatmap logits
        [N, 56, 56, K]. Active only when config.NUM_KEYPOINTS > 0."""
        return self.kp_head.apply({"params": params["kp_head"]}, pooled)

    def anchors(self) -> np.ndarray:
        """Pixel-space anchors [num_anchors, 4] (model.py:991-995)."""
        return config_anchors(self.config)


def param_count(params: Params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
