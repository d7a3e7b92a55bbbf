from .misc import Bunch, clip, add_default_handler, logger  # noqa: F401
