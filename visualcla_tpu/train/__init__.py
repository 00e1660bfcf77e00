from .trainer import (  # noqa: F401
    TrainState,
    causal_lm_loss,
    make_train_step,
    make_optimizer,
    init_train_state,
    train_forward_logits,
    stage1_trainable,
    stage2_trainable,
)
