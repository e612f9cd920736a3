"""Checkpointing: torch .pth conversion + orbax save/load/resume."""

from maskrcnn_tpu.checkpoint.store import (checkpoint_path, latest_epoch,
                                           load_checkpoint, load_params,
                                           save_checkpoint)
from maskrcnn_tpu.checkpoint.torch_convert import (from_torch_state_dict,
                                                   load_torch_checkpoint,
                                                   name_map,
                                                   to_torch_state_dict)

__all__ = ["checkpoint_path", "latest_epoch", "load_checkpoint",
           "load_params", "save_checkpoint", "from_torch_state_dict",
           "load_torch_checkpoint", "name_map", "to_torch_state_dict"]
