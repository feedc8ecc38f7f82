from .registry import generator_spec, create_generator  # noqa: F401
