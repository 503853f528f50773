from jamun_tpu.train.checkpoints import (
    CheckpointManager,
    find_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from jamun_tpu.train.distributions import (
    CategoricalValue,
    ClippedLogNormalSigma,
    ConstantSigma,
    ExponentialSigma,
    UniformMeasurement,
    UniformPlusNormal,
    UniformSigma,
    WeightedMeasurement,
)
from jamun_tpu.train.ema import ema_init, ema_update
from jamun_tpu.train.loggers import ConsoleLogger, CSVLogger, MultiLogger, maybe_wandb_logger
from jamun_tpu.train.loop import Trainer, TrainerConfig
from jamun_tpu.train.lr_schedules import linear, linear_warmup_linear_decay, linear_warmup_plateau
from jamun_tpu.train.state import TrainState, create_train_state, make_eval_step, make_train_step
