"""Debug taps (DUMP_IQ analog): shapes, spectral content, file dumps."""

import numpy as np

from gr_lora_tpu import LoraConfig
from gr_lora_tpu.core.codec import encode
from gr_lora_tpu.debug import dump_rx_taps, rx_taps
from gr_lora_tpu.models.modulator import modulate

CFG = LoraConfig(sf=7, cr=1, crc=True, ldr=False, explicit_header=False,
                 payload_len=4, p=2, fft_factor=2)


def test_rx_taps_shapes_and_peaks(tmp_path):
    iq = modulate(encode(bytes([1, 2, 3, 4]), CFG), CFG)
    taps = dump_rx_taps(iq, CFG, tmp_path)
    n, k = CFG.num_samples, CFG.bin_size
    hop = n // 8
    num = (len(iq) - n) // hop + 1
    assert taps["raw"].shape == (num, n, 2)
    assert taps["dechirped"].shape == (num, n, 2)
    assert taps["folded"].shape == (num, k)
    assert taps["pyramid_fft_add"].shape == (num, k)
    # Preamble hops must show a dominant dechirped tone.
    pre_hops = slice(4 * 8, 6 * 8)   # inside the 8-chirp preamble
    folded = taps["folded"][pre_hops]
    assert (folded.max(-1) > 10 * np.median(folded, -1)).all()
    assert (tmp_path / "folded.npy").exists()
    assert np.array_equal(np.load(tmp_path / "folded.npy"), taps["folded"])
