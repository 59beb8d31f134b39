from .engine import make_infer_step, run_inference  # noqa: F401
