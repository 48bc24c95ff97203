from bist_tpu.decode.beam import beam_search, greedy_decode, extract_hyps
