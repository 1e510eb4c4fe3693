from .maxim_rules import convert_maxim, maxim_name_map
from .torch_import import (
    convert_state_dict, load_torch_checkpoint, save_as_orbax,
    t_conv, t_dwconv, t_linear,
)

__all__ = ["convert_state_dict", "load_torch_checkpoint", "save_as_orbax",
           "t_conv", "t_dwconv", "t_linear",
           "convert_maxim", "maxim_name_map"]
