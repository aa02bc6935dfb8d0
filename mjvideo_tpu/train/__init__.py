"""Training: losses, freeze policies, optax/pjit trainer, 3-stage pipeline."""

from .losses import (  # noqa: F401
    ALPHA_STAGE2,
    ALPHA_STAGE3,
    FOCAL_ALPHA_ASPECT,
    FOCAL_ALPHA_CRITERIA,
    STAGES,
    StageSpec,
    bradley_terry_loss,
    criteria_loss,
    gating_sparsity_loss,
    stage1_loss,
    stage2_loss,
    stage3_loss,
)
from .trainer import (  # noqa: F401
    TrainConfig,
    Trainer,
    make_loss_fn,
    make_optimizer,
    make_train_step,
    trainable_mask,
    warm_start,
)
