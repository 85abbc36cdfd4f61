from e2e_asr_tpu.models import asr, attention, decoder, encoder, lm  # noqa: F401
