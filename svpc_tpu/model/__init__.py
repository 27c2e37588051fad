from svpc_tpu.model.svpc import SVPCModel, ModelOutputs  # noqa: F401
