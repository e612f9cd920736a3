#!/usr/bin/env python
"""Train / evaluate Mask R-CNN on MS COCO.

Same argv surface as the reference CLI (reference: coco.py:142-254):

    python coco.py train    --dataset /path/to/coco [--year 2014]
                            [--model weights] [--logs dir]
    python coco.py evaluate --dataset /path/to/coco [--limit 500]

Training runs the reference 3-stage schedule (heads->40, 4+->120,
all->160 @ LR/10; reference coco.py:217-241) over a data-parallel device
mesh; evaluation reports COCO bbox then segm AP on the minival subset.
"""

import argparse
import os

import jax

from maskrcnn_tpu.api import Detector
from maskrcnn_tpu.config import CocoConfig, CocoInferenceConfig
from maskrcnn_tpu.utils.profiler import enable_compile_cache

enable_compile_cache()
from maskrcnn_tpu.data.coco import CocoDataset
from maskrcnn_tpu.data.pipeline import BatchLoader
from maskrcnn_tpu.eval.evaluate import evaluate_coco
from maskrcnn_tpu.models.mask_rcnn import MaskRCNN
from maskrcnn_tpu.train.trainer import Trainer

DEFAULT_LOGS_DIR = os.path.join(os.getcwd(), "logs")
DEFAULT_DATASET_YEAR = "2014"


def main():
    parser = argparse.ArgumentParser(
        description="Train/Eval Mask R-CNN Model on MS COCO.",
        epilog="Protocol presets (throughput / box-quality / "
        "mask-quality / balanced) with measured AP+img/s: see "
        'README.md "Choosing an inference protocol".')
    parser.add_argument("command", metavar="<command>",
                        help="'train' or 'evaluate' on MS COCO")
    parser.add_argument("--dataset", required=True,
                        metavar="/path/to/coco/",
                        help="Directory of the MS-COCO dataset")
    parser.add_argument("--year", required=False,
                        default=DEFAULT_DATASET_YEAR, metavar="<year>",
                        help="Year of the MS-COCO dataset (default=2014)")
    parser.add_argument("--model", required=False,
                        default="models/mask_rcnn_coco.pth",
                        metavar="/path/to/weights.pth",
                        help="Path to weights (.pth or orbax dir)")
    parser.add_argument("--logs", required=False, default=DEFAULT_LOGS_DIR,
                        metavar="/path/to/logs/",
                        help="Logs and checkpoints directory")
    parser.add_argument("--limit", required=False, default=500,
                        metavar="<image count>",
                        help="Images to use for evaluation (default=500)")
    parser.add_argument("--devices", required=False, default=None, type=int,
                        help="Device count for the mesh (default: all)")
    parser.add_argument("--sp", required=False, default=1, type=int,
                        help="Spatial partitioning: chips cooperating "
                        "per image (shards the canvas-H dim; data-"
                        "parallel width becomes devices/sp — the "
                        "multi-chip HBM-relief knob for 1024px+ "
                        "training)")
    parser.add_argument("--steps-per-epoch", required=False, default=None,
                        type=int, help="Override STEPS_PER_EPOCH "
                        "(smoke runs; default: config value 1000)")
    parser.add_argument("--epochs", required=False, default=None, type=int,
                        help="Train a single stage to this epoch instead "
                        "of the 3-stage schedule")
    parser.add_argument(
        "--curriculum", required=False, default=None, metavar="SPEC",
        help="canvas curriculum 'canvas:epochs[:lr],...' e.g. "
             "'512:40,1024:160' — train early epochs at a smaller "
             "canvas (params carry over; re-jits per stage), finish at "
             "full resolution. Replaces the 3-stage layer schedule "
             "(trains 'all' layers each stage); an opt-in departure "
             "from the reference protocol like IMAGE_CANVAS.")
    parser.add_argument(
        "--augment", required=False, default=None, metavar="SPEC",
        help="training augmentation beyond the default flip, e.g. "
             "'scale=0.8:1.25,crop=0.7:1.0,color=0.2' "
             "(data/augment.py; opt-in departure from the reference's "
             "flip-only protocol)")
    parser.add_argument("--grad-accum", required=False, default=1,
                        type=int, help="Gradient accumulation: split "
                        "each step's batch into this many sequential "
                        "micro-batches (one optimizer update; effective "
                        "batch = BATCH_SIZE, micro = BATCH_SIZE/accum "
                        "per device group — the HBM-relief knob)")
    parser.add_argument("--keypoints", required=False, default=0,
                        type=int, metavar="K",
                        help="Enable the keypoint branch with K "
                        "keypoints (17 = COCO person keypoints): "
                        "training consumes 'keypoints' annotations and "
                        "adds the mrn_kp loss; evaluate additionally "
                        "reports the OKS keypoint AP. A two-head "
                        "checkpoint loads with the new head at its "
                        "init weights.")
    parser.add_argument("--soft-nms", required=False, default=0.0,
                        type=float, metavar="SIGMA",
                        help="evaluate with gaussian Soft-NMS at this "
                        "sigma instead of hard detection NMS "
                        "(config.DETECTION_SOFT_NMS_SIGMA; 0 = off)")
    parser.add_argument("--tta", action="store_true",
                        help="evaluate with horizontal-flip test-time "
                        "augmentation: two box passes (canvas + "
                        "x-mirror) NMS-merged, masks from the "
                        "un-flipped features (config.TTA_HFLIP)")
    parser.add_argument("--cascade", required=False, default=None,
                        metavar="IOUS",
                        help="Cascade R-CNN stage IoU thresholds, e.g. "
                        "'0.5,0.6,0.7' (config.CASCADE_STAGES). Must "
                        "match the checkpoint's stage structure for "
                        "evaluate; measured +11.2 bbox AP75 on the "
                        "trained gate (BENCHMARKS.md)")
    parser.add_argument("--cascade-mask-last", action="store_true",
                        help="with --cascade, train the mask head on "
                        "the LAST stage's refined boxes (Cascade Mask "
                        "R-CNN placement; config.CASCADE_MASK_LAST — "
                        "training-time only, +7.2 segm AP measured)")
    args = parser.parse_args()
    cascade = (tuple(float(x) for x in args.cascade.split(","))
               if args.cascade else ())
    if args.cascade_mask_last and not cascade:
        # advisor r4: without --cascade, CASCADE_STAGES=() makes the
        # CASCADE_MASK_LAST branch unreachable — a silent no-op that
        # would let a user believe they trained Cascade Mask R-CNN.
        parser.error("--cascade-mask-last requires --cascade "
                     "(e.g. --cascade 0.5,0.6,0.7)")
    print("Command: ", args.command)
    print("Model: ", args.model)
    print("Dataset: ", args.dataset)
    print("Year: ", args.year)
    print("Logs: ", args.logs)

    n_dev = args.devices or jax.device_count()
    if args.command == "train":
        config = CocoConfig(NUM_DEVICES=n_dev, SP_DEVICES=args.sp,
                            GRAD_ACCUM_STEPS=args.grad_accum,
                            NUM_KEYPOINTS=args.keypoints,
                            CASCADE_STAGES=cascade,
                            CASCADE_MASK_LAST=args.cascade_mask_last)
        assert config.BATCH_SIZE % max(args.grad_accum, 1) == 0, (
            f"BATCH_SIZE {config.BATCH_SIZE} must divide by "
            f"--grad-accum {args.grad_accum}")
    else:
        # batch-sharded eval over the dp mesh (Detector handles it).
        # Masks decode on the host PIL path here: it is the
        # reference-parity decode (data.py:265-284), and segm AP on real
        # weights has not been validated against the (faster,
        # approximately-equal) device decode — serving keeps the device
        # path on.
        config = CocoInferenceConfig(NUM_DEVICES=n_dev,
                                     SP_DEVICES=args.sp,
                                     DEVICE_MASK_DECODE=False,
                                     NUM_KEYPOINTS=args.keypoints,
                                     TTA_HFLIP=args.tta,
                                     DETECTION_SOFT_NMS_SIGMA=args.soft_nms,
                                     CASCADE_STAGES=cascade)
    config.display()

    if args.command == "train":
        model = MaskRCNN(config)
        params = model.init(jax.random.PRNGKey(0))
        if os.path.exists(args.model):
            from maskrcnn_tpu.checkpoint.store import load_params
            params = load_params(args.model, params, config.BACKBONE)
            print("Loaded weights ", args.model)

        train_ds = CocoDataset(args.dataset, "train", args.year, config)
        val_ds = CocoDataset(args.dataset, "minival", args.year, config)
        # per-host shard: each process loads 1/process_count of every
        # global batch; shard_batch assembles the global array
        nproc, pid = jax.process_count(), jax.process_index()
        assert config.BATCH_SIZE % nproc == 0, (
            f"global batch {config.BATCH_SIZE} must divide evenly over "
            f"{nproc} processes — per-host shards would otherwise sum "
            "to less than the global batch")
        augment = None
        if args.augment:
            from maskrcnn_tpu.data.augment import Augmenter
            augment = Augmenter.parse(args.augment)
            print("Augmentation:", augment)
        train_iter = BatchLoader(train_ds, config.BATCH_SIZE // nproc,
                                 shard_index=pid, num_shards=nproc,
                                 augment=augment)
        val_iter = BatchLoader(val_ds, config.BATCH_SIZE // nproc,
                               shard_index=pid, num_shards=nproc)

        trainer = Trainer(model, checkpoint_dir=args.logs)
        # Resume: newest epoch checkpoint under --logs wins over --model
        # (reference parses the epoch out of the checkpoint filename,
        # model.py:1045-1093; here it's directory metadata).
        params, resumed = trainer.try_resume(params)
        kw = {}
        if args.steps_per_epoch:
            kw["steps_per_epoch"] = args.steps_per_epoch
        if args.curriculum:
            from maskrcnn_tpu.train.trainer import fit_canvas_curriculum
            stages = []
            for part in args.curriculum.split(","):
                bits = part.split(":")
                stage = {"canvas": int(bits[0]), "epochs": int(bits[1])}
                if len(bits) > 2:
                    stage["lr"] = float(bits[2])
                stages.append(stage)

            def make_iters(cfg):
                tds = CocoDataset(args.dataset, "train", args.year, cfg)
                vds = CocoDataset(args.dataset, "minival", args.year, cfg)
                return (BatchLoader(tds, cfg.BATCH_SIZE // nproc,
                                    shard_index=pid, num_shards=nproc),
                        BatchLoader(vds, cfg.BATCH_SIZE // nproc,
                                    shard_index=pid, num_shards=nproc))

            fit_canvas_curriculum(config, params, make_iters, stages,
                                  jax.random.PRNGKey(1), layers="all",
                                  checkpoint_dir=args.logs, **kw)
        elif args.epochs:
            trainer.fit(params, train_iter, config.LEARNING_RATE,
                        args.epochs, "heads", jax.random.PRNGKey(1),
                        val_iter=val_iter, **kw)
        else:
            trainer.fit_coco_schedule(params, train_iter,
                                      jax.random.PRNGKey(1),
                                      val_iter=val_iter, **kw)
    elif args.command == "evaluate":
        detector = Detector(config)
        if os.path.exists(args.model):
            detector.load_weights(args.model)
            print("Loaded weights ", args.model)
        else:
            print("Weight file not found ...")
        val_ds = CocoDataset(args.dataset, "minival", args.year, config)
        limit = int(args.limit)
        print(f"Running COCO evaluation on {limit} images.")
        bs = max(8, 2 * n_dev)
        evaluate_coco(detector, val_ds, val_ds.coco, "bbox", limit=limit,
                      batch_size=bs)
        evaluate_coco(detector, val_ds, val_ds.coco, "segm", limit=limit,
                      batch_size=bs)
        if args.keypoints:
            # OKS keypoint AP (needs person_keypoints-style annotations
            # in the gt; results carry the branch's decoded keypoints)
            evaluate_coco(detector, val_ds, val_ds.coco, "keypoints",
                          limit=limit, batch_size=bs)
    else:
        print(f"'{args.command}' is not recognized. "
              "Use 'train' or 'evaluate'")


if __name__ == "__main__":
    main()
