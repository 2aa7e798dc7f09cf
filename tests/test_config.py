"""Config-tree + misc coverage tests."""

import os

import numpy as np

from msc_tpu.config import Config, vlm_preset
from msc_tpu.models.tokenizer import ByteTokenizer, PAD_ID


def test_from_env_overrides(monkeypatch):
    monkeypatch.setenv("NUSCENES_DATAROOT", "/data/nuscenes")
    monkeypatch.setenv("NUSCENES_VERSION", "v1.0-trainval")
    monkeypatch.setenv("MSC_USE_MOCK", "1")
    monkeypatch.setenv("MSC_BACKEND", "vlm")
    monkeypatch.setenv("MSC_MESH_DATA", "2")
    monkeypatch.setenv("MSC_MESH_MODEL", "4")
    monkeypatch.setenv("MSC_TEST_MODE", "false")
    monkeypatch.setenv("MSC_NUM_TEST_SCENES", "7")
    cfg = Config.from_env()
    assert cfg.data.dataroot == "/data/nuscenes"
    assert cfg.data.version == "v1.0-trainval"
    assert cfg.data.use_mock is True
    assert cfg.model.backend.kind == "vlm"
    assert (cfg.model.mesh.data, cfg.model.mesh.model) == (2, 4)
    assert cfg.eval.test_mode is False
    assert cfg.eval.num_test_scenes == 7


def test_vlm_presets():
    tiny = vlm_preset("msc-vlm-tiny")
    s = vlm_preset("msc-vlm-s")
    m = vlm_preset("msc-vlm-m")
    assert tiny.d_model < s.d_model < m.d_model
    assert m.n_heads % m.n_kv_heads == 0
    try:
        vlm_preset("nope")
        assert False
    except KeyError:
        pass


def test_tokenizer_left_padding():
    tok = ByteTokenizer()
    out = tok.pad_batch([[1, 2], [3, 4, 5, 6]], pad_to=8, left=True)
    assert out.shape == (2, 8)
    assert list(out[0]) == [PAD_ID] * 6 + [1, 2]
    assert list(out[1]) == [PAD_ID] * 4 + [3, 4, 5, 6]


def test_config_serializable():
    d = Config().to_dict()
    import json

    json.dumps(d)
    assert d["lidar"]["dbscan_eps"] == 0.5
    assert d["model"]["vlm"]["page_size"] == 128


def test_distill_tokenize_pairs():
    from msc_tpu.training.distill import tokenize_pairs
    from msc_tpu.models.tokenizer import ByteTokenizer, EOS_ID, PAD_ID

    tok = ByteTokenizer()
    pairs = [([{"role": "system", "content": "s"},
               {"role": "user", "content": "q" * 50}],
              "There are <target><cnt>2</cnt> <obj>cars</obj></target>.",
              "gt")]
    ids, mask = tokenize_pairs(pairs, tok, max_len=64)
    assert ids.shape == (1, 64)
    # loss mask covers exactly the target tokens (incl. EOS)
    n_target = mask[0].sum()
    assert n_target == len(pairs[0][1].encode()) + 1
    # prompt tail-truncated to leave room for the target
    assert (ids[0][mask[0]][-1]) == EOS_ID
    assert not mask[0][0]
