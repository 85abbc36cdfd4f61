from e2e_asr_tpu.training.step import make_train_step, compute_loss  # noqa: F401
