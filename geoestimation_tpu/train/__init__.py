"""Training runtime: steps, optimizer, loop, checkpoints (layer L4)."""

from . import checkpoint, init, loop, optim, step
