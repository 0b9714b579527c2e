from glass_tpu.train.schedule import PlateauState, plateau_init, plateau_step
from glass_tpu.train.metrics import binary_f1, micro_f1, auroc
from glass_tpu.train.loop import Trainer, TrainConfig
