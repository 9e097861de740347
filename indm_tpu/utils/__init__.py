from indm_tpu.utils.profiling import StepTimer, trace_context
from indm_tpu.utils.meters import RunningAverageMeter
