from emcid_tpu.text.tokenizer import CLIPBPETokenizer, make_tiny_tokenizer
from emcid_tpu.text.token_range import decode_tokens, find_token_range
