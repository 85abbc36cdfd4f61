from e2e_asr_tpu.decode.greedy import greedy_decode, ctc_greedy_decode  # noqa: F401
from e2e_asr_tpu.decode.beam import beam_search, BeamResult  # noqa: F401
