"""Training: optax optimizer/schedule matching the reference recipe,
jitted train/eval steps, checkpointing, and metric writers."""

from vidsgg.train.optim import make_optimizer, reference_lr_schedule  # noqa: F401
from vidsgg.train.state import TrainState, create_train_state  # noqa: F401
from vidsgg.train.steps import eval_step, make_train_step  # noqa: F401
