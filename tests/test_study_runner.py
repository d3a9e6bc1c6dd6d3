"""run_study.py manifest integrity: every arm resolves to a real script
and a real variant, and queue-spec parsing rejects malformed entries."""

import os
import subprocess
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)

import run_study  # noqa: E402


def test_known_arms_resolve():
    arms = run_study.known_arms()
    # Every study contributes at least its nogan control arm.
    for study in run_study.STUDIES:
        assert any(n.startswith(study + "/") for n in arms), study
    # Named arms point at existing studies and real variants.
    for name, (study, variant, extra) in run_study.NAMED_ARMS.items():
        assert study in run_study.STUDIES
        script = os.path.join(SCRIPTS, run_study.STUDIES[study][0])
        assert os.path.exists(script)
        assert f'"{variant}"' in open(script).read(), (name, variant)
        assert len(extra) % 2 == 0  # flag/value pairs


def test_campaign_arms_present():
    """The arms behind committed docs/evidence_r5 JSONs must stay
    regenerable by name."""
    arms = run_study.known_arms()
    for required in ["continuous/cont_warm", "continuous/cont_bit4",
                     "continuous/rollout", "continuous/nogan",
                     "continuous/cont_warm_cap045", "factorial/s2_9k",
                     "texture/gp_rollout", "texture/gp3_rollout",
                     "texture/gp30_rollout", "texture/gp_rollout_d192",
                     "texture/gp_rollout_d48", "vector/vec_warm",
                     "vector/nogan", "vector/vec_warm_cap068"]:
        assert required in arms, required


@pytest.mark.parametrize("spec", ["continuous/cont_warm", "noseed:",
                                  ":3", "continuous/cont_warm:x"])
def test_malformed_queue_spec_rejected(spec):
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "run_study.py"),
         "--queue", spec], capture_output=True, text=True)
    assert r.returncode == 2  # argparse error, not a silent skip
    assert "malformed" in r.stderr or "unknown arm" in r.stderr


def test_list_runs_clean():
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "run_study.py"), "--list"],
        capture_output=True, text=True)
    assert r.returncode == 0
    assert "continuous/cont_warm_cap045" in r.stdout


def test_merge_hparams():
    extra, hp = run_study.merge_hparams(
        ["--hparams", "diversity_cap=0.45"], "seed_offset=1")
    assert extra == [] and hp == "diversity_cap=0.45,seed_offset=1"
    # No user overrides: bundle passes through untouched.
    extra, hp = run_study.merge_hparams(
        ["--hparams", "diversity_cap=0.45"], None)
    assert extra == ["--hparams", "diversity_cap=0.45"] and hp is None
    # No bundle: user string stands alone.
    extra, hp = run_study.merge_hparams([], "a=1")
    assert extra == [] and hp == "a=1"
