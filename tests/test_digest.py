"""Stability digest (utils/digest.py): the end-of-run self-report must
correctly classify the r4-style collapse — overflowed norm metrics
(None in jsonl), grad spikes, dead-D logit plateau, best-step lag —
and stay quiet on a healthy trajectory."""

import json

from locate_tpu.utils.digest import (
    format_digest,
    load_metrics_jsonl,
    stability_digest,
)


def _loss_row(step, dg=1.0, gg=2.0, rl=1.0, fl=-1.0, **kw):
    return {"step": step, "d_loss": 1.0, "g_loss": 1.0,
            "d_grad_norm": dg, "g_grad_norm": gg,
            "real_logits": rl, "fake_logits": fl, **kw}


def test_healthy_run_digest():
    rows = [_loss_row(s) for s in range(100, 1100, 100)]
    rows += [{"step": s, "eval_rfid": 100.0 - s / 100} for s in
             range(200, 1200, 200)]
    d = stability_digest(rows)
    assert d["grad_norms"]["d_grad_norm"]["spike_steps"] == []
    assert d["grad_norms"]["d_grad_norm"]["overflowed_logged"] == 0
    assert not d["logits_tail"]["dead_d"]
    assert d["eval"]["evals_since_best"] == 0
    text = "\n".join(format_digest(d))
    assert "DEAD" not in text and "REGRESSING" not in text


def test_collapse_run_digest():
    # healthy start, then exploding norms with overflowed (None) metrics
    # and a dead-D plateau; best eval early, regression after.
    rows = [_loss_row(s) for s in range(100, 1600, 100)]
    rows += [_loss_row(s, dg=1e15, gg=None, rl=0.01, fl=-0.02)
             for s in range(1600, 2100, 100)]
    rows += [{"step": s, "eval_rfid": 90.0 if s == 500 else 120.0}
             for s in range(500, 2500, 250)]
    d = stability_digest(rows)
    assert d["grad_norms"]["g_grad_norm"]["overflowed_logged"] == 5
    assert d["grad_norms"]["d_grad_norm"]["spike_steps"]  # 1e15 >> median
    assert d["logits_tail"]["dead_d"]
    assert d["eval"]["best_step"] == 500
    assert d["eval"]["evals_since_best"] == 7
    text = "\n".join(format_digest(d))
    assert "DEAD DISCRIMINATOR" in text and "REGRESSING" in text
    assert "NON-FINITE metric values logged: 5" in text


def test_guard_counters_surface():
    rows = [_loss_row(s, d_grad_limit_count=3, g_grad_limit_count=1,
                      d_grad_limit_streak=2, g_grad_limit_streak=0,
                      d_nonfinite_streak=0, g_nonfinite_streak=0)
            for s in range(100, 400, 100)]
    d = stability_digest(rows)
    assert d["guards"]["d_grad_limit_count"] == 3
    text = "\n".join(format_digest(d))
    assert "grad_norm_limit skips: 4 total" in text


def test_empty_and_loader(tmp_path):
    assert stability_digest([]) is None
    assert "nothing to digest" in format_digest(None)[0]
    p = tmp_path / "m.jsonl"
    p.write_text(json.dumps({"step": 1, "d_loss": 1.0}) + "\n\n")
    rows = load_metrics_jsonl(str(p))
    assert len(rows) == 1 and stability_digest(rows)["steps_logged"] == 1
