from .checkpoint import save_net, load_net, latest_epoch  # noqa: F401
