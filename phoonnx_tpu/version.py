"""phoonnx_tpu version."""

VERSION_MAJOR = 0
VERSION_MINOR = 1
VERSION_BUILD = 0

__version__ = f"{VERSION_MAJOR}.{VERSION_MINOR}.{VERSION_BUILD}"
VERSION_STR = __version__
