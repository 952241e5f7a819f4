"""Training layer: losses, on-device metrics, optimizers, jit trainer, checkpoints."""

from eyegaze_tpu.train.losses import (
    cross_entropy,
    weighted_cross_entropy,
    symmetry_loss,
    ibs_alignment_loss,
    ibs_contrastive_loss,
)
from eyegaze_tpu.train.metrics import (
    confusion_matrix,
    classification_metrics,
    per_class_metrics,
    roc_curves,
)
from eyegaze_tpu.train.optim import (
    make_optimizer,
    warmup_cosine_schedule,
    cosine_annealing_schedule,
)
from eyegaze_tpu.train.state import TrainState, create_train_state
from eyegaze_tpu.train.checkpoint import CheckpointManager
from eyegaze_tpu.train.trainer import Trainer, TrainerConfig
