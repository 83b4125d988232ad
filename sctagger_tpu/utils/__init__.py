from .misc import cdiv, round_up, pick_bucket, batch_iter, full_fast  # noqa: F401
