"""Device-mesh data parallelism (replaces the reference's GPU_COUNT knob)."""

from maskrcnn_tpu.parallel.mesh import (make_mesh,
                                        make_parallel_eval_losses,
                                        make_parallel_predict,
                                        make_parallel_train_step, replicate,
                                        shard_batch)

__all__ = ["make_mesh", "make_parallel_eval_losses",
           "make_parallel_predict", "make_parallel_train_step",
           "replicate", "shard_batch"]
