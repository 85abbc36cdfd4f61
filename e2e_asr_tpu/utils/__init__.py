from e2e_asr_tpu.utils.metrics import cal_er, edit_distance  # noqa: F401
from e2e_asr_tpu.utils.timer import Timer  # noqa: F401
from e2e_asr_tpu.utils.misc import human_format  # noqa: F401
