from e2e_asr_tpu.data.text import load_text_encoder  # noqa: F401
from e2e_asr_tpu.data.dataset import load_dataset  # noqa: F401
