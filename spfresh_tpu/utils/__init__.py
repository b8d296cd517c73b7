from spfresh_tpu.utils import metrics
from spfresh_tpu.utils.profiling import PhaseTimer, annotate, device_trace

__all__ = ["PhaseTimer", "annotate", "device_trace", "metrics"]
