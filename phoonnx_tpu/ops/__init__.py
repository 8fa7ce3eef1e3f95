"""TPU compute ops: STFT/mel, monotonic alignment search, kernels."""
