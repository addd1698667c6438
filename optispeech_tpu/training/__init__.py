"""Training layer: compiled GAN train step, optimizer/schedule, trainer loop,
orbax checkpointing."""
