"""Engine-level tests: optimizer parity vs torch SGD, LR schedule math,
checkpoint flatten/unflatten, resume, evaluator output contract."""

import io
import os
import re
from contextlib import redirect_stdout

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from federated_multi_modal_tpu.config import get_cfg_default
from federated_multi_modal_tpu.engine.checkpoint import (
    drop_class_conditioned,
    flatten_params,
    load_checkpoint,
    save_checkpoint,
    unflatten_into,
)
from federated_multi_modal_tpu.engine.evaluator import Classification, compute_accuracy
from federated_multi_modal_tpu.engine.optim import (
    build_lr_schedule,
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)


def test_sgd_matches_torch_with_clip_and_decay(rng):
    """Full chain parity: clip(1.0) -> weight decay -> momentum -> lr."""
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.1
    cfg.OPTIM.MOMENTUM = 0.9
    cfg.OPTIM.WEIGHT_DECAY = 0.01
    cfg.OPTIM.GRAD_CLIP_NORM = 1.0

    w0 = rng.standard_normal(10).astype(np.float32)
    grads = [rng.standard_normal(10).astype(np.float32) * 3 for _ in range(5)]

    # torch reference
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([wt], max_norm=1.0)
        opt.step()

    # ours
    tx = build_optimizer(cfg.OPTIM)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), atol=1e-5, rtol=1e-5
    )


class _DasslWarmupWrapper:
    """Faithful torch-side simulation of Dassl's ``_BaseWarmupScheduler``:
    the successor (cosine) scheduler only starts stepping once warmup
    ends, so post-warmup epoch ``e`` runs at successor counter
    ``e - warmup_epoch``."""

    def __init__(self, opt, successor, warmup_epoch, kind, cons_lr=None,
                 min_lr=None, base_lr=None):
        self.opt = opt
        self.successor = successor
        self.warmup_epoch = warmup_epoch
        self.kind = kind
        self.cons_lr = cons_lr
        self.min_lr = min_lr
        self.base_lr = base_lr
        self.last_epoch = 0

    def lr(self):
        e = self.last_epoch
        if e >= self.warmup_epoch:
            return self.successor.get_last_lr()[0]
        if self.kind == "constant":
            return self.cons_lr
        return self.min_lr if e == 0 else self.base_lr * e / self.warmup_epoch

    def step(self):
        if self.last_epoch >= self.warmup_epoch:
            self.successor.step()
        self.last_epoch += 1


@pytest.mark.parametrize("warmup_type,warmup_epoch", [
    ("constant", 1), ("linear", 3),
])
def test_schedule_matches_dassl_warmup_wrapper(warmup_type, warmup_epoch):
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.0035
    cfg.OPTIM.MAX_EPOCH = 9
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = warmup_epoch
    cfg.OPTIM.WARMUP_TYPE = warmup_type
    cfg.OPTIM.WARMUP_CONS_LR = 1e-5
    cfg.OPTIM.WARMUP_MIN_LR = 1e-5
    sched = build_lr_schedule(cfg.OPTIM)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.0035)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=9)
    wrapper = _DasslWarmupWrapper(
        opt, tsched, warmup_epoch, warmup_type,
        cons_lr=1e-5, min_lr=1e-5, base_lr=0.0035,
    )
    for epoch in range(9):
        assert sched(epoch) == pytest.approx(wrapper.lr(), rel=1e-6), epoch
        wrapper.step()


def test_lr_injection():
    cfg = get_cfg_default()
    tx = build_optimizer(cfg.OPTIM, learning_rate=0.5)
    state = tx.init({"w": jnp.zeros(3)})
    updates, state = tx.update({"w": jnp.ones(3)}, state, {"w": jnp.zeros(3)})
    state = set_learning_rate(state, 0.0)
    updates, state = tx.update({"w": jnp.ones(3)}, state, {"w": jnp.zeros(3)})
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)


def test_flatten_unflatten_roundtrip():
    tree = {
        "a": {"b": jnp.ones((2, 2)), "c": [jnp.zeros(3), jnp.ones(3)]},
        "d": jnp.full((4,), 7.0),
    }
    flat = flatten_params(tree)
    assert set(flat) == {"a.b", "a.c.0", "a.c.1", "d"}
    flat["d"] = np.full((4,), 9.0, np.float32)
    new, used = unflatten_into(tree, flat)
    assert "d" in used
    np.testing.assert_allclose(np.asarray(new["d"]), 9.0)
    np.testing.assert_allclose(np.asarray(new["a"]["b"]), 1.0)


def test_unflatten_shape_mismatch_nonstrict_keeps_model_value():
    tree = {"x": jnp.zeros((3,))}
    new, used = unflatten_into(tree, {"x": np.zeros((5,), np.float32)})
    assert np.asarray(new["x"]).shape == (3,)
    assert "x" not in used


def test_drop_class_conditioned():
    sd = {
        "prompt_learner.ctx": np.zeros(2),
        "prompt_learner.token_prefix": np.zeros(2),
        "prompt_learner.token_suffix": np.zeros(2),
        "token_prefix": np.zeros(2),
    }
    out = drop_class_conditioned(sd)
    assert set(out) == {"prompt_learner.ctx"}


def test_checkpoint_io_and_marker(tmp_path):
    state = {"epoch": 3, "state_dict": {"w": np.ones(2)}, "cfg": "x"}
    fpath = save_checkpoint(state, str(tmp_path))
    assert fpath.endswith("model.pth.tar-3")
    assert (tmp_path / "checkpoint").read_text() == "model.pth.tar-3"
    loaded = load_checkpoint(fpath)
    assert loaded["epoch"] == 3


def test_evaluator_log_contract():
    cfg = get_cfg_default()
    ev = Classification(cfg)
    logits = np.asarray([[2.0, 1.0], [0.0, 3.0], [5.0, 0.0]])
    labels = np.asarray([0, 1, 1])
    ev.process(logits, labels)
    buf = io.StringIO()
    with redirect_stdout(buf):
        results = ev.evaluate()
    out = buf.getvalue()
    assert results["accuracy"] == pytest.approx(100 * 2 / 3)
    # parse_test_res regex contract
    m = re.search(r"\* accuracy: ([\.\deE+-]+)%", out)
    assert m and float(m.group(1)) == pytest.approx(66.67)
    assert "=> result" in out


def test_compute_accuracy_topk():
    logits = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.asarray([1, 2])
    top1, top2 = compute_accuracy(logits, labels, topk=(1, 2))
    assert top1 == pytest.approx(50.0)
    assert top2 == pytest.approx(50.0)


def test_parse_test_res_tool(tmp_path):
    """End-to-end: fake seed logs -> parser output."""
    import subprocess
    import sys

    exp = tmp_path / "exp"
    for seed, acc in [(1, 80.0), (2, 90.0)]:
        d = exp / f"seed{seed}"
        d.mkdir(parents=True)
        (d / "log.txt").write_text(
            f"training...\nFinished training\n=> result\n* accuracy: {acc:.2f}%\n"
        )
    out = subprocess.run(
        [sys.executable, "tools/parse_test_res.py", str(exp)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert "* accuracy: 85.00%" in out.stdout, out.stdout


def test_orbax_backend_roundtrip(tmp_path):
    from federated_multi_modal_tpu.engine.checkpoint_orbax import (
        ORBAX_AVAILABLE,
        restore_pytree,
        save_pytree,
    )

    if not ORBAX_AVAILABLE:
        pytest.skip("orbax not installed")
    tree = {
        "a": jnp.ones((3,)),
        "b": {"c": jnp.full((2, 2), 7.0), "d": None},
    }
    path = str(tmp_path / "orbax_state")
    save_pytree(path, tree)
    like = {
        "a": jnp.zeros((3,)),
        "b": {"c": jnp.zeros((2, 2)), "d": None},
    }
    restored = restore_pytree(path, like)
    np.testing.assert_allclose(np.asarray(restored["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(restored["b"]["c"]), 7.0)
    assert restored["b"]["d"] is None


def test_evaluator_confusion_matrix(tmp_path):
    """TEST.COMPUTE_CMAT saves a confusion matrix artifact (Dassl parity)."""
    from federated_multi_modal_tpu.config import get_cfg_default
    from federated_multi_modal_tpu.engine.evaluator import Classification

    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TEST.COMPUTE_CMAT = True
    ev = Classification(cfg)
    logits = np.eye(3)[[0, 1, 2, 0]]
    labels = np.array([0, 1, 1, 0])
    ev.process(logits, labels)
    ev.evaluate()
    cmat = np.load(tmp_path / "cmat.npy")
    assert cmat.shape == (3, 3)
    assert cmat[1, 1] == 1 and cmat[1, 2] == 1 and cmat[0, 0] == 2
    assert cmat.sum() == 4


def test_profiling_harness(tmp_path):
    """TRAIN.PROFILE_DIR: trace context writes a profile; StepTimer syncs."""
    import jax.numpy as jnp

    from federated_multi_modal_tpu.utils.profiling import StepTimer, trace

    with trace(""):  # disabled: no-op
        pass

    pdir = tmp_path / "prof"
    with trace(str(pdir)):
        _ = jnp.ones(8) + 1
    assert pdir.exists() and any(pdir.rglob("*"))

    timer = StepTimer(sync_every=2)
    for _ in range(4):
        timer.step(jnp.ones(4))
    assert len(timer.history) == 2
    assert timer.avg_step_seconds >= 0.0


def test_adam_matches_torch_with_coupled_decay(rng):
    """torch Adam couples L2 into the gradient before the moment estimates;
    the optax chain must reproduce its trajectory."""
    import optax

    from federated_multi_modal_tpu.engine.optim import build_optimizer

    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = 0.01
    cfg.OPTIM.WEIGHT_DECAY = 0.05
    cfg.OPTIM.GRAD_CLIP_NORM = 0.0

    w0 = rng.standard_normal(8).astype(np.float32)
    grads = [rng.standard_normal(8).astype(np.float32) for _ in range(4)]

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tp], lr=0.01, weight_decay=0.05)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = build_optimizer(cfg.OPTIM)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_unflatten_strict_shapes_raises_like_torch():
    """Trainer checkpoint loads use torch's load_state_dict(strict=False)
    contract: missing keys tolerated, but a present key with a wrong shape
    raises (e.g. a class-specific ctx trained on a different class count)."""
    tree = {"ctx": jnp.zeros((4, 2, 8)), "other": jnp.zeros(3)}
    with pytest.raises(ValueError, match="Shape mismatch for ctx"):
        unflatten_into(tree, {"ctx": np.zeros((7, 2, 8), np.float32)},
                       strict_shapes=True)
    # missing keys are still fine under strict_shapes
    new, used = unflatten_into(tree, {"other": np.ones(3, np.float32)},
                               strict_shapes=True)
    assert used == {"other"}


def test_macro_f1_matches_sklearn():
    """Dassl's evaluator computes ``100 * f1_score(y_true, y_pred,
    average="macro", labels=np.unique(y_true))`` (sklearn); our hand-rolled
    ``_macro_f1`` must agree, including the edge semantics: classes never
    predicted (F1=0 via zero-division), and predicted labels absent from
    y_true (EXCLUDED from the macro average by ``labels=``)."""
    from sklearn.metrics import f1_score

    from federated_multi_modal_tpu.config import get_cfg_default

    rng = np.random.default_rng(7)
    cases = [
        # (y_true, y_pred)
        (rng.integers(0, 5, 200), rng.integers(0, 5, 200)),   # all present
        (np.zeros(50, np.int64), rng.integers(0, 3, 50)),     # 1-class truth
        (rng.integers(0, 3, 80), rng.integers(0, 6, 80)),     # preds outside
        (np.arange(10) % 4, np.arange(10) % 4),               # perfect
        (np.array([1, 1, 2, 2]), np.array([2, 2, 1, 1])),     # all wrong
    ]
    cfg = get_cfg_default()
    for y_true, y_pred in cases:
        y_true = np.asarray(y_true)
        y_pred = np.asarray(y_pred)
        ev = Classification(cfg)
        # logits whose argmax reproduces y_pred exactly
        n = int(max(y_true.max(), y_pred.max())) + 1
        logits = np.zeros((len(y_true), n), np.float32)
        logits[np.arange(len(y_true)), y_pred] = 1.0
        ev.process(logits, y_true)
        got = ev.evaluate()["macro_f1"]
        want = 100.0 * f1_score(
            y_true, y_pred, average="macro", labels=np.unique(y_true),
            zero_division=0,
        )
        np.testing.assert_allclose(got, want, atol=1e-9), (y_true, y_pred)


def test_single_step_list_stepsize_matches_dassl():
    """Dassl's single_step takes the LAST element of a list-valued
    STEPSIZE (dassl lr_scheduler: ``stepsize = stepsize[-1]``); goldened
    against torch StepLR at that step size."""
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.1
    cfg.OPTIM.MAX_EPOCH = 40
    cfg.OPTIM.LR_SCHEDULER = "single_step"
    cfg.OPTIM.STEPSIZE = (10, 20)
    cfg.OPTIM.GAMMA = 0.5
    cfg.OPTIM.WARMUP_EPOCH = 0
    sched = build_lr_schedule(cfg.OPTIM)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=20, gamma=0.5)
    for epoch in range(40):
        assert sched(epoch) == pytest.approx(
            opt.param_groups[0]["lr"], rel=1e-6), epoch
        tsched.step()


def test_set_learning_rate_does_not_retrace():
    """set_learning_rate must keep the hyperparam leaf's jit aval stable
    (strong-typed f32 array): a python float would weak-type the leaf and
    force a full retrace of the train step after every LR update."""
    import jax

    cfg = get_cfg_default()
    tx = build_optimizer(cfg.OPTIM, learning_rate=0.5)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)

    traces = []

    @jax.jit
    def step(params, state, grads):
        traces.append(1)
        updates, state = tx.update(grads, state, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params, updates), \
            state

    grads = {"w": jnp.ones(3)}
    params, state = step(params, state, grads)
    assert len(traces) == 1
    state = set_learning_rate(state, 0.123)
    params, state = step(params, state, grads)
    assert len(traces) == 1, "LR update changed the jit aval (retrace)"
    assert get_learning_rate(state) == pytest.approx(0.123)


def test_best_val_without_val_split_falls_back(tmp_path):
    """FINAL_MODEL='best_val' on a dataset with NO val split must fall back
    to the test split (Dassl semantics), write model-best.pth.tar, and
    after_train must reload it without FileNotFoundError; NO_TEST=True
    must skip best-val tracking entirely."""
    import federated_multi_modal_tpu.trainers  # noqa: F401
    from federated_multi_modal_tpu.engine import build_trainer

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.DATASET.NAME = "Synthetic"
    cfg.MODEL.BACKBONE.NAME = "Tiny"
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.CANVAS_SIZE = 40
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 1
    cfg.VERBOSE = False
    cfg.TRAINER.NAME = "CoOp"
    cfg.TRAINER.COOP.PREC = "fp32"
    cfg.OPTIM.MAX_EPOCH = 1
    cfg.TEST.FINAL_MODEL = "best_val"
    cfg.DATALOADER.TEST.BATCH_SIZE = 8
    cfg.TPU.DATA_PARALLEL = False

    trainer = build_trainer(cfg)
    # simulate a dataset with no val split
    trainer.val_loader = None
    trainer.train()  # must not raise; best checkpoint written via fallback
    import os

    assert os.path.isfile(os.path.join(
        cfg.OUTPUT_DIR, "prompt_learner", "model-best.pth.tar"))

    # NO_TEST skips best-val tracking (Dassl's do_test gate)
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.OUTPUT_DIR = str(tmp_path / "out2")
    cfg2.TEST.NO_TEST = True
    trainer2 = build_trainer(cfg2)
    trainer2.val_loader = None
    trainer2.train()
    assert not os.path.isfile(os.path.join(
        cfg2.OUTPUT_DIR, "prompt_learner", "model-best.pth.tar"))
