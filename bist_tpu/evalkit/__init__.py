from bist_tpu.evalkit.ptb_tokenizer import ptb_tokenize
from bist_tpu.evalkit.bleu import BleuScorer
from bist_tpu.evalkit.rouge import rouge_l_corpus
from bist_tpu.evalkit.cider import CiderScorer
from bist_tpu.evalkit.meteor import meteor_corpus
from bist_tpu.evalkit.harness import evaluate_coco, get_hypotheses, StopwordFilter
