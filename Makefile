# Convenience targets (see README.md / CLAUDE.md for details)

.PHONY: test test-fast smoke bench bench-extractor bench-kernels bench-train bench-serving demo demo-tgif dryrun reproduce

test:            ## full suite on CPU (virtual 8-device mesh)
	python -m pytest tests/ -q

test-fast:       ## core correctness checks only
	python -m pytest tests/test_model_forward.py tests/test_beam.py \
	  tests/test_data.py tests/test_metrics_golden.py -q

smoke:           ## 3-stage CLI pipeline on synthetic data (CPU)
	bash scripts/test.sh cpu

bench:           ## generation throughput on the local accelerator
	python bench.py

bench-extractor: ## ResNeXt-101 3D extraction throughput
	python scripts/bench_extractor.py

demo:            ## full-pipeline learning proof (train->generate->evaluate)
	bash scripts/demo_learning.sh

dryrun:          ## multi-chip sharding dry-run (8 virtual devices)
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

bench-kernels:   ## XLA vs Pallas dispatch-crossover sweep (BENCH.md table)
	python scripts/bench_kernels.py

bench-train:     ## train-step dtype/width sweep (f32 vs bf16)
	python scripts/bench_train.py

reproduce:       ## download-day AVSD reproduction, synthetic rehearsal
	bash scripts/reproduce_avsd.sh --synthetic --device cpu

demo-tgif:       ## TGIF-QA (VideoQA) learning proof on synthetic features
	bash scripts/demo_tgif.sh

bench-serving:   ## dynamic-batching responder latency/throughput
	python scripts/bench_serving.py
