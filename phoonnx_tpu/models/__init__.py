"""Model families implemented TPU-natively (JAX/XLA/Pallas)."""
