"""Block descriptors (blocks_meta) mirror the reference GRC YAML schemas."""

import gr_lora_tpu.blocks_meta as M
from gr_lora_tpu import blocks


def test_all_blocks_enumerable():
    ids = [b.id for b in M.ALL_BLOCKS]
    assert ids == ["lora_mod", "lora_encode", "lora_decode", "lora_demod",
                   "lora_pyramid_demod", "lora_weak_demod"]


def test_grc_defaults():
    # Defaults transcribed from grc/lora_*.block.yml.
    assert M.get("lora_mod").defaults() == {
        "spreading_factor": 8, "sync_word": 0x12}
    d = M.get("lora_demod").defaults()
    assert d["fft_factor"] == 10 and d["fs_bw_ratio"] == 2.0
    assert d["beta"] == 25.0 and d["payload_len"] == 4
    p = M.get("lora_pyramid_demod").defaults()
    assert p["fft_factor"] == 2 and p["threshold"] == 0.005
    assert p["fs_bw_ratio"] == 8.0
    e = M.get("lora_encode").defaults()
    assert e["code_rate"] == 4 and e["crc"] is False and e["header"] is False
    w = M.get("lora_weak_demod").defaults()
    assert w["sym_num"] == 10 and w["fft_factor"] == 8


def test_factories_resolve_to_blocks_api():
    for b in M.ALL_BLOCKS:
        assert hasattr(blocks, b.factory), b.factory


def test_port_shapes():
    pd = M.get("lora_pyramid_demod")
    assert [p.domain for p in pd.inputs] == ["stream", "message"]
    assert [p.domain for p in pd.outputs] == ["message"]
    assert M.get("lora_mod").outputs[0].dtype == "complex"
