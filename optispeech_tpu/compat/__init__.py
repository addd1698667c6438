from .torch_import import convert_torch_generator_state_dict, load_torch_checkpoint

__all__ = ["convert_torch_generator_state_dict", "load_torch_checkpoint"]
