"""Training-mode dispatch guards (run_training).

The reference's detector.forward routes sgcls/predcls training through the
GT-box path after printing "error! we do not train predcls and sgcls task!"
(/root/reference/lib/object_detector.py:47-55) and then cannot run: sgcls
entries carry no union_feat for the relation head, predcls feeds a 36-wide
one-hot into a 37-label CE. run_training must refuse those configs LOUDLY
before touching any data — no config may reach the wrong data path silently.
"""

import pytest

from nl_vsgg_tpu.utils.config import load_config
from tests.fixtures import load_tool


class _Args:
    max_videos = 0


@pytest.fixture(scope="module")
def train_mod():
    return load_tool("train_STTran")


@pytest.mark.parametrize("mode", ["sgcls", "predcls"])
def test_run_training_refuses_gt_modes(train_mod, mode):
    cfg = load_config(None, {"mode": mode})
    with pytest.raises(ValueError, match="not a shipped NL-VSGG recipe"):
        train_mod.run_training(cfg, _Args(), train_mod.build_model)


def test_run_training_refuses_non_wks_sgdet(train_mod):
    cfg = load_config(None, {"mode": "sgdet", "is_wks": False})
    with pytest.raises(ValueError, match="not a shipped NL-VSGG recipe"):
        train_mod.run_training(cfg, _Args(), train_mod.build_model)
