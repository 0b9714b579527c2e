from glass_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from glass_tpu.utils.profiling import StepMeter, trace, nan_check_mode
