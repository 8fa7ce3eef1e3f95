"""Native (C++) host-side kernels with ctypes bindings."""

from phoonnx_tpu.native.build import maximum_path_native  # noqa: F401
