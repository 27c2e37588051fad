from svpc_tpu.data.anet import (  # noqa: F401
    load_annotations, load_durations, timestamp_to_feature_span,
)
from svpc_tpu.data.pipeline import (  # noqa: F401
    CaptionDataset, Batch, batch_examples, pad_batch_to,
)
