"""Training pipeline: losses, GAN train step, data, trainer, export."""
