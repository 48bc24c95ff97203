"""CLI end-to-end smoke — the in-suite version of the reference's test_mode
pipeline (SURVEY §4.1): train → generate (beam + greedy + oracle) → evaluate
via the actual entry-point scripts on tiny synthetic data, CPU."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, cwd=REPO, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"   # placeholder; scripts force cpu via flag
    env.update(env_extra or {})
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-3000:]}\nSTDERR:{r.stderr[-3000:]}"
    return r


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("avsd")
    run(["scripts/make_synth_data.py", str(root), "--n-dialogs", "5",
         "--ft-dim", "32"])
    return str(root)


@pytest.fixture(scope="module")
def trained(synth, tmp_path_factory):
    exp = tmp_path_factory.mktemp("exp")
    model = os.path.join(str(exp), "mtn")
    run(["train.py",
         "--fea-type", "resnext_st",
         "--train-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--train-set", os.path.join(synth, "train_test.json"),
         "--valid-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--valid-set", os.path.join(synth, "valid_test.json"),
         "--model", model, "--num-epochs", "1", "--batch-size", "8",
         "--nb-blocks", "1", "--nb-venc-blocks", "1", "--nb-cenc-blocks", "1",
         "--d-model", "32", "--att-h", "4", "--include-caption", "summary",
         "--warmup-steps", "20", "--report-interval", "1", "--device", "cpu"])
    return synth, model


def test_train_artifacts(trained):
    synth, model = trained
    assert os.path.exists(model + ".conf")
    assert os.path.exists(model + "_params.txt")
    assert os.path.isdir(model + "_best")
    train_csv = open(model + "_train.csv").read().splitlines()
    assert train_csv[0] == "epoch,step,loss,ae_temporal_loss,ae_spatial_loss"
    assert len(train_csv) > 1
    trace_csv = open(model + "_trace.csv").read().splitlines()
    assert trace_csv[0] == "epoch,split,loss,ae_temporal_loss,ae_spatial_loss"
    assert any(l.split(",")[1] == "val" for l in trace_csv[1:])


@pytest.mark.parametrize("style", ["beam_search", "greedy", "oracle"])
def test_generate_and_evaluate(trained, tmp_path, style):
    synth, model = trained
    out = str(tmp_path / f"result_{style}.json")
    run(["generate.py",
         "--test-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--test-set", os.path.join(synth, "test_test.json"),
         "--model-conf", model + ".conf", "--model", model,
         "--beam", "3", "--penalty", "1.0", "--nbest", "3",
         "--decode-style", style, "--output", out,
         "--gen-batch-size", "8", "--device", "cpu"])
    result = json.load(open(out))
    orig = json.load(open(os.path.join(synth, "test_test.json")))
    assert len(result["dialogs"]) == len(orig["dialogs"])
    # structure preserved, answers replaced with generated strings
    for rd, od in zip(result["dialogs"], orig["dialogs"]):
        assert rd["image_id"] == od["image_id"]
        assert len(rd["dialog"]) == len(od["dialog"])
        for turn in rd["dialog"]:
            assert isinstance(turn["answer"], str)

    r = run(["evaluate.py", out])
    assert "Bleu_4" in r.stdout and "CIDEr" in r.stdout
    assert os.path.exists(out.replace(".json", ".eval"))


def test_train_resume(trained, tmp_path):
    synth, model = trained
    model2 = str(tmp_path / "mtn2")
    run(["train.py",
         "--fea-type", "resnext_st",
         "--train-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--train-set", os.path.join(synth, "train_test.json"),
         "--valid-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--valid-set", os.path.join(synth, "valid_test.json"),
         "--model", model2, "--num-epochs", "2", "--batch-size", "8",
         "--nb-blocks", "1", "--nb-venc-blocks", "1", "--nb-cenc-blocks", "1",
         "--d-model", "32", "--att-h", "4", "--include-caption", "summary",
         "--warmup-steps", "20", "--device", "cpu",
         "--resume", model + "_best"])
    assert os.path.isdir(model2 + "_best")


def test_generate_data_parallel_mesh(trained, tmp_path):
    """generate.py decodes with batch rows sharded over an 8-device CPU mesh
    (round-2 continuation: data-parallel generation); tail batches pad to
    the mesh size and pad rows are dropped from the result."""
    synth, model = trained
    out = str(tmp_path / "result_dp.json")
    run(["generate.py",
         "--test-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--test-set", os.path.join(synth, "test_test.json"),
         "--model-conf", model + ".conf", "--model", model,
         "--beam", "3", "--penalty", "1.0", "--nbest", "3",
         "--decode-style", "beam_search", "--output", out,
         "--gen-batch-size", "8", "--device", "cpu"],
        env_extra={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    result = json.load(open(out))
    orig = json.load(open(os.path.join(synth, "test_test.json")))
    assert len(result["dialogs"]) == len(orig["dialogs"])
    for rd in result["dialogs"]:
        for turn in rd["dialog"]:
            assert isinstance(turn["answer"], str)


def test_save_all_and_resume_from_mid_epoch(synth, tmp_path):
    """--save-all writes one checkpoint per epoch plus the best pointer
    (reference train.py:156-177 semantics: all epochs kept, best tracked);
    --resume from a MID epoch continues at the right epoch index and leaves
    a full artifact trail (VERDICT r3 #9)."""
    model = os.path.join(str(tmp_path), "mtn")
    common = [
        "train.py",
        "--fea-type", "resnext_st",
        "--train-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
        "--train-set", os.path.join(synth, "train_test.json"),
        "--valid-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
        "--valid-set", os.path.join(synth, "valid_test.json"),
        "--model", model, "--batch-size", "8",
        "--nb-blocks", "1", "--nb-venc-blocks", "1", "--nb-cenc-blocks", "1",
        "--d-model", "32", "--att-h", "4", "--include-caption", "summary",
        "--warmup-steps", "20", "--report-interval", "1", "--device", "cpu",
        "--save-all", "1",
    ]
    run(common + ["--num-epochs", "2"])
    for suffix in ("_1", "_2", "_best"):
        assert os.path.isdir(model + suffix), suffix

    # the best pointer is a REAL checkpoint of the min-valid-loss epoch
    sys.path.insert(0, REPO)
    from bist_tpu.train.checkpoint import load_checkpoint

    trace = [l.split(",") for l in
             open(model + "_trace.csv").read().splitlines()[1:]]
    val = {int(r[0]): float(r[2]) for r in trace if r[1] == "val"}
    best_epoch = min(val, key=val.get)       # 1-based (trace convention)
    assert load_checkpoint(model + "_best")["meta"]["epoch"] == best_epoch - 1

    # resume from the MID checkpoint (epoch 1 of 2) and run through epoch 4:
    # epochs 2-4 must train (fresh per-epoch checkpoints); the stale
    # epoch-2 rows from the first run are TRIMMED (round-4 fix), so the
    # trace holds exactly one train + one val row per epoch, no duplicates
    run(common + ["--num-epochs", "4", "--resume", model + "_1"])
    for suffix in ("_2", "_3", "_4"):
        assert os.path.isdir(model + suffix), suffix
    trace2 = [l.split(",") for l in
              open(model + "_trace.csv").read().splitlines()[1:]]
    from collections import Counter
    assert Counter((int(r[0]), r[1]) for r in trace2) == {
        (e, s): 1 for e in (1, 2, 3, 4) for s in ("train", "val")}
    # resumed best checkpoint stays loadable and generate can consume it
    out = str(tmp_path / "result_resumed.json")
    run(["generate.py",
         "--test-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--test-set", os.path.join(synth, "test_test.json"),
         "--model-conf", model + ".conf", "--model", model,
         "--decode-style", "greedy", "--output", out,
         "--gen-batch-size", "8", "--device", "cpu"])
    assert json.load(open(out))["dialogs"]


def test_init_csv_logs_resume_trims_rewritten_epochs(tmp_path):
    """Round-4 review: resuming from an EARLIER checkpoint than the log tail
    (e.g. model_1 after 4 completed epochs) must drop the rows the resumed
    run will rewrite — no epoch may carry two conflicting rows."""
    from bist_tpu.train.loop import append_trace, init_csv_logs

    prefix = str(tmp_path / "m")
    train_log, trace_log = init_csv_logs(prefix)
    losses = {"out": 1.0, "temporal_ae": 0.0, "spatial_ae": 0.0}
    for e in range(4):
        append_trace(trace_log, e, "train", losses)
        append_trace(trace_log, e, "val", losses)
        with open(train_log, "a") as f:
            f.write(f"{e + 1},1,1e0,0e0,0e0\n")
    # resume from the epoch-0 checkpoint: epochs 2..4 will be retrained
    init_csv_logs(prefix, resume=True, start_epoch=1)
    with open(trace_log) as f:
        trace_epochs = [ln.split(",")[0] for ln in f.readlines()[1:]]
    assert trace_epochs == ["1", "1"]
    with open(train_log) as f:
        train_epochs = [ln.split(",")[0] for ln in f.readlines()[1:]]
    assert train_epochs == ["1"]
    # fresh (non-resume) init still truncates to just the header
    init_csv_logs(prefix)
    with open(trace_log) as f:
        assert len(f.readlines()) == 1


def test_generate_from_reference_format_checkpoint(trained, tmp_path):
    """Drop-in migration CLI (round 4): generate.py pointed straight at a
    REFERENCE-format checkpoint pair (pickled-module .pth.tar + pickled
    (vocab, args) .conf) auto-detects it, imports in place, and decodes —
    answers identical to the native-checkpoint run (greedy, same weights)."""
    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "model")):
        pytest.skip("reference tree not available")
    synth, model = trained

    from bist_tpu.config import load_conf
    from bist_tpu.convert import export_reference_checkpoint
    from bist_tpu.train.checkpoint import load_checkpoint

    vocab, cfg, tcfg, extra = load_conf(model + ".conf")
    payload = load_checkpoint(model + "_best")
    pth, conf = export_reference_checkpoint(
        payload["params"], cfg, vocab, str(tmp_path / "mtn"),
        reference_root=REF)

    outs = {}
    for tag, margs in (
            ("native", ["--model-conf", model + ".conf", "--model", model]),
            ("ref", ["--model-conf", conf, "--model", str(tmp_path / "mtn"),
                     "--reference-root", REF])):
        out = str(tmp_path / f"result_{tag}.json")
        run(["generate.py",
             "--test-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
             "--test-set", os.path.join(synth, "test_test.json")]
            + margs +
            ["--decode-style", "greedy", "--output", out,
             "--gen-batch-size", "8", "--device", "cpu"])
        outs[tag] = json.load(open(out))

    ans = lambda r: [t["answer"] for d in r["dialogs"] for t in d["dialog"]]
    assert ans(outs["ref"]) == ans(outs["native"])


def test_serve_from_reference_format_checkpoint(trained, tmp_path):
    """serve.py drop-in: point --model at a reference-format checkpoint
    pair; the server detects it, imports, warms up, and answers HTTP."""
    import socket
    import time
    import urllib.request

    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "model")):
        pytest.skip("reference tree not available")
    synth, model = trained

    from bist_tpu.config import load_conf
    from bist_tpu.convert import export_reference_checkpoint
    from bist_tpu.train.checkpoint import load_checkpoint

    vocab, cfg, _, _ = load_conf(model + ".conf")
    payload = load_checkpoint(model + "_best")
    export_reference_checkpoint(payload["params"], cfg, vocab,
                                str(tmp_path / "mtn"), reference_root=REF)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "serve.py", "--model", str(tmp_path / "mtn"),
         "--model-conf", str(tmp_path / "mtn.conf"),
         "--reference-root", REF, "--device", "cpu",
         "--port", str(port), "--max-batch", "4", "--scan-unroll", "1",
         "--beam", "2"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 600
        last = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"serve.py exited rc={proc.returncode}:\n"
                    f"{proc.stdout.read()[-3000:]}")
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=5) as r:
                    if json.load(r)["ok"]:
                        break
            except Exception as e:   # noqa: BLE001 — server still warming
                last = e
                time.sleep(2.0)
        else:
            raise AssertionError(f"server never became healthy: {last}")

        import numpy as np

        fts = np.random.default_rng(0).standard_normal(
            (5, 16, 32)).astype(np.float32)
        req = urllib.request.Request(
            f"{base}/respond",
            data=json.dumps({"question": "what is he doing",
                             "history": "a man is walking",
                             "caption": "the man",
                             "features": fts.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            resp = json.load(r)
        assert isinstance(resp["answer"], str)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_train_init_from_reference_checkpoint(trained, tmp_path):
    """train.py --init-from-ref: fine-tune a reference-format checkpoint —
    vocab + model shape come from the checkpoint, params initialise from
    its weights (first-batch loss well below the from-scratch first-batch
    loss on the same data/seed), artifacts write normally."""
    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "model")):
        pytest.skip("reference tree not available")
    synth, model = trained

    from bist_tpu.config import load_conf
    from bist_tpu.convert import export_reference_checkpoint
    from bist_tpu.train.checkpoint import load_checkpoint

    vocab, cfg, _, _ = load_conf(model + ".conf")
    payload = load_checkpoint(model + "_best")
    export_reference_checkpoint(payload["params"], cfg, vocab,
                                str(tmp_path / "refmtn"), reference_root=REF)

    ft_model = str(tmp_path / "ft" / "mtn")
    os.makedirs(os.path.dirname(ft_model))
    run(["train.py",
         "--fea-type", "resnext_st",
         "--train-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--train-set", os.path.join(synth, "train_test.json"),
         "--valid-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--valid-set", os.path.join(synth, "valid_test.json"),
         "--model", ft_model,
         "--init-from-ref", str(tmp_path / "refmtn_best"),
         "--reference-root", REF,
         "--num-epochs", "1", "--batch-size", "8",
         # model-shape flags deliberately DIFFERENT from the checkpoint —
         # --init-from-ref must take the shape from the checkpoint instead
         "--nb-blocks", "2", "--d-model", "64",
         "--include-caption", "summary",
         "--warmup-steps", "20", "--report-interval", "1", "--device", "cpu"])

    vocab_ft, cfg_ft, _, _ = load_conf(ft_model + ".conf")
    assert vocab_ft == vocab
    assert cfg_ft.d_model == cfg.d_model and cfg_ft.nb_blocks == cfg.nb_blocks

    first_loss = lambda path: float(
        open(path).read().splitlines()[1].split(",")[2])
    scratch = first_loss(model + "_train.csv")
    finetune = first_loss(ft_model + "_train.csv")
    assert finetune < scratch - 0.1, (finetune, scratch)

    # caption-preprocessing mismatch fails FAST with a clear message: the
    # checkpoint cfg keeps include_caption/separate_caption but the data
    # loaders use the CLI flags (round-4 review finding)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"   # placeholder; --device cpu forces cpu
    r = subprocess.run(
        [sys.executable, "train.py",
         "--fea-type", "resnext_st",
         "--train-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--train-set", os.path.join(synth, "train_test.json"),
         "--valid-path", os.path.join(synth, "<FeaType>/<ImageID>.npy"),
         "--valid-set", os.path.join(synth, "valid_test.json"),
         "--model", str(tmp_path / "ft2" / "mtn"),
         "--init-from-ref", str(tmp_path / "refmtn_best"),
         "--reference-root", REF,
         "--num-epochs", "1", "--batch-size", "8",
         "--include-caption", "none",       # checkpoint says "summary"
         "--device", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode != 0
    assert "include-caption" in (r.stderr + r.stdout)
