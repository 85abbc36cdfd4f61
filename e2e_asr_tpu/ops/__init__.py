from e2e_asr_tpu.ops.frontend import compute_features  # noqa: F401
from e2e_asr_tpu.ops.ctc import ctc_loss  # noqa: F401
