import pytest

from gdiet_tpu import pattern as pat
from gdiet_tpu.config import (
    MM_F_FRAG_MODE,
    MM_F_SR,
    IndexOptions,
    MapOptions,
    check_options,
    options_for,
)


def test_sr_preset():
    io, mo = options_for("sr")
    assert (io.k, io.w) == (21, 11)
    assert mo.flag & MM_F_SR and mo.flag & MM_F_FRAG_MODE
    assert (mo.a, mo.b, mo.q, mo.e, mo.q2, mo.e2) == (2, 8, 12, 2, 24, 1)
    # GDiet CLI defaults override the preset's min_cnt (main.c:168)
    assert mo.min_cnt == 1.0
    assert mo.AF_max_loc == 20


def test_hifi_preset():
    io, mo = options_for("map-hifi")
    assert (io.k, io.w) == (19, 19)
    assert (mo.a, mo.q, mo.q2) == (1, 6, 26)


def test_pattern_coercion_and_checks():
    io, mo = options_for(None, pattern="100")
    assert io.pattern_len == mo.pattern_len == 3
    with pytest.raises(ValueError):
        options_for(None, pattern="102")
    with pytest.raises(ValueError):
        check_options(IndexOptions(k=0), MapOptions())


def test_pattern_machinery():
    assert pat.ones_locations("1101") == (0, 1, 3)
    # diet_length mirrors sketch.c:1942-1948 (prefix rule for the remainder)
    assert pat.diet_length(10, "10", 0) == 5
    assert pat.diet_length(10, "10", 1) == 5  # 9 left: 4 full periods + '1'
    assert pat.diet_length(7, "110", 0) == 5
    gm = pat.gather_map(10, "10", 0)
    assert list(gm) == [0, 2, 4, 6, 8]
    gm = pat.gather_map(10, "110", 1)
    assert list(gm) == [1, 2, 4, 5, 7, 8]
