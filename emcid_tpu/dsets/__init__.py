from emcid_tpu.dsets.iceb import (
    RequestDataset,
    CustomObjectRequestDataset,
    ImageNetMendRequestDataset,
    get_filtered_dataset,
    ObjectPromptDataset,
    compose_alias_test_requests,
)
from emcid_tpu.dsets.artists import ArtistRequestsDataset, load_artist_eval_prompts
from emcid_tpu.dsets.debias import DebiasRequestDataset
from emcid_tpu.dsets.timed_road import TIMEDRoadRequestDataset, CONTEXT_TEMPLATE
from emcid_tpu.dsets.global_concepts import (
    NSFWEditRequestDataset,
    get_i2p_editing_requests,
)
from emcid_tpu.dsets.stat_dataset import (
    TokenizedDataset,
    length_collation,
    flatten_masked_batch,
)
from emcid_tpu.dsets.coco import load_coco_30k
