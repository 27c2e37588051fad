from svpc_tpu.decode.greedy import greedy_decode, make_greedy_fn  # noqa: F401
from svpc_tpu.decode.postprocess import (  # noqa: F401
    remove_duplicate_words, batch_to_sentences, build_submission,
)
