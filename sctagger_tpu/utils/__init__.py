from .misc import cdiv, round_up, pick_bucket, batch_iter  # noqa: F401
