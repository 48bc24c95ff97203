"""bist_tpu — a TPU-native JAX framework for video-grounded dialogue.

A from-scratch rebuild of the capabilities of salesforce/BiST (EMNLP 2020,
"Bi-directional Spatio-Temporal Reasoning for Video-Grounded Dialogues")
designed TPU-first: functional JAX model with pytree parameters, jit/pjit
data-parallel training over a `jax.sharding.Mesh`, KV-cached batched beam
search as a single compiled program, and XLA/Pallas compute kernels.

Layer map (mirrors the reference's capability surface, see SURVEY.md):

  bist_tpu.config    — typed configs covering every reference CLI flag
                       (reference: configs/train_configs.py, test_configs.py)
  bist_tpu.vocab     — vocabulary build + tokenisation
                       (reference: data/data_handler.py:22, data/data_utils.py:30)
  bist_tpu.data      — AVSD JSON flattening, feature store, static-shape batching
                       (reference: data/{data_handler,dataset}.py)
  bist_tpu.models    — transformer primitives, BiST factorized attention,
                       multimodal decoder, pointer generators, ResNeXt-101 3D
                       (reference: model/{modules,encoder,decoder,generator}.py,
                        video-classification-3d-cnn-pytorch/models/resnext.py)
  bist_tpu.train     — label-smoothed losses, Noam schedule, jit train step
                       (reference: model/{label_smoothing,optimize}.py, train.py)
  bist_tpu.decode    — jit-compiled greedy + batched beam search with KV cache
                       (reference: model/decode.py)
  bist_tpu.evalkit   — PTB tokenizer + BLEU/METEOR/ROUGE-L/CIDEr in pure py3
                       (reference: dstc7avsd_eval/)
  bist_tpu.parallel  — device mesh + sharding helpers (replaces nn.DataParallel,
                       reference train.py:96-99)
"""

__version__ = "0.4.0"  # kept in sync with pyproject.toml (test_packaging)
