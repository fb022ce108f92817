"""SDUST masking behavior (validated byte-exactly against the reference
binary with -T 20 during development; unit checks here)."""

from gdiet_tpu.ops.sdust import dust_minimizers, sdust_core


def test_sdust_masks_low_complexity():
    seq = "ACGTAGCTTAGCAA" + "AT" * 60 + "GCGTACGATCAGCT"
    regs = sdust_core(seq, 20, 64)
    assert regs, "poly-AT run must be masked"
    s, e = regs[0]
    assert s <= 16 and e >= len(seq) - 16


def test_sdust_clean_sequence_unmasked():
    seq = "ACGTTGCATGGATCCTAGGCATCGATCGGCTAGCTTACGGAT" * 3
    assert sdust_core(seq, 20, 64) == []


def test_dust_minimizers_drop():
    seq = "AT" * 100
    # one fake minimizer with span 21 at position 50 (fully inside the LCR)
    seeds = [((123 << 8) | 21, (50 << 1))]
    assert dust_minimizers(seeds, seq, 20) == []
    # with masking off everything is kept
    assert dust_minimizers(seeds, seq, 0) == seeds
