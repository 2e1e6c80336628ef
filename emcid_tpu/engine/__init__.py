from emcid_tpu.engine.extract import (
    RequestBatch,
    prepare_request_batch,
    module_io_at_words,
)
from emcid_tpu.engine.emcid import (
    apply_emcid_to_text_encoder,
    execute_emcid_text_encoder,
)
