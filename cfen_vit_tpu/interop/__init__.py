from .torch_import import import_generator_state_dict  # noqa: F401
