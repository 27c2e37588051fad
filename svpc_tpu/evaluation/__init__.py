from svpc_tpu.evaluation.para_eval import evaluate_submission  # noqa: F401
