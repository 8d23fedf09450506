"""RLEv2 golden byte vectors + round-trip suite.

Ported from the reference's xUnit suite
(/root/reference/test/ApacheOrcDotNet.Test/Encodings/IntegerRunLengthEncodingV2_Test.cs).
These byte vectors are authoritative: they pin MSB-first bit order and every
sub-mode's header layout.
"""

import numpy as np
import pytest

from apacheorcdotnet_ray.codecs import rlev2


def check_read(expected, data: bytes, signed: bool):
    actual = rlev2.decode(data, signed)
    assert actual.tolist() == list(expected)


def check_write(expected: bytes, values, signed: bool, aligned: bool):
    actual = rlev2.encode(np.array(values, dtype=np.int64), signed, aligned)
    assert actual.hex() == expected.hex()


def roundtrip(values, signed: bool, aligned: bool, expected_len=None):
    arr = np.array(values, dtype=np.int64)
    encoded = rlev2.encode(arr, signed, aligned)
    if expected_len is not None:
        assert len(encoded) == expected_len
    decoded = rlev2.decode(encoded, signed)  # also asserts full consumption
    assert decoded.tolist() == arr.tolist()


# --- exact byte vectors (Test.cs:13-82) ---------------------------------


def test_readwrite_short_repeat():
    longs = [10000] * 5
    data = bytes([0x0A, 0x27, 0x10])
    check_read(longs, data, False)
    check_write(data, longs, False, False)


def test_readwrite_direct():
    longs = [23713, 43806, 57005, 48879]
    data = bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF])
    check_read(longs, data, False)
    check_write(data, longs, False, False)


def test_readwrite_patched_base():
    longs = [2030, 2000, 2020, 1000000, 2040, 2050, 2060, 2070, 2080, 2090,
             2100, 2110, 2120, 2130, 2140, 2150, 2160, 2170, 2180, 2190]
    data = bytes([0x8E, 0x13, 0x2B, 0x21, 0x07, 0xD0, 0x1E, 0x00, 0x14, 0x70,
                  0x28, 0x32, 0x3C, 0x46, 0x50, 0x5A, 0x64, 0x6E, 0x78, 0x82,
                  0x8C, 0x96, 0xA0, 0xAA, 0xB4, 0xBE, 0xFC, 0xE8])
    check_read(longs, data, False)
    check_write(data, longs, False, False)


def test_readwrite_delta():
    longs = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    data = bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46])
    check_read(longs, data, False)
    check_write(data, longs, False, True)


def test_readwrite_delta2():
    longs = [0x6] * 0x120
    data = bytes([0xC1, 0x1F, 0x0C, 0x00])
    check_read(longs, data, True)
    check_write(data, longs, True, False)


# --- round trips (Test.cs:22-231) ---------------------------------------


def test_roundtrip_short_repeat():
    roundtrip([1] * 10, False, False)
    roundtrip([-1] * 10, True, False)
    for v in (0xFFFF, 0xFFFFFF, 0xFFFFFFFF, 0x11223344, 0x1122334455,
              0x112233445566, 0x11223344556677, 0x1122334455667788):
        roundtrip([v] * 4, False, False)


def test_roundtrip_direct():
    roundtrip([-5, 5, -5, 5], True, False)
    roundtrip([-5, 5, -5, 5], True, True)


@pytest.mark.parametrize("signed", [True, False])
def test_roundtrip_delta_repeating(signed):
    longs = [10000] * 12
    roundtrip(longs, signed, True)
    roundtrip(longs, signed, False)


def test_roundtrip_delta_repeating_negative():
    longs = [-10000] * 12
    roundtrip(longs, True, True)
    roundtrip(longs, True, False)


@pytest.mark.parametrize("longs,signed", [
    ([10000, 30000, 50000, 70000, 90000, 110000], False),
    ([-10000, 10000, 30000, 50000, 70000, 90000], True),
    ([-10000, -30000, -50000, -70000, -90000, -110000], True),
    ([10000, -10000, -30000, -50000, -70000, -90000], True),
    ([1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096], False),
    ([-1, -2, -4, -8, -16, -32, -64, -128, -256, -512, -1024, -2048, -4096], True),
])
def test_roundtrip_delta_offsets(longs, signed):
    roundtrip(longs, signed, True)
    roundtrip(longs, signed, False)


def test_roundtrip_delta_single_then_many():
    longs = [8] + [22] * 511
    roundtrip(longs, False, True)
    roundtrip(longs, False, False)


@pytest.mark.parametrize("longs", [
    [0] + [1] * 15,
    [1] * 12 + [2] * 12,
    [2] * 12 + [1] * 12,
    [2, 1] + [0] * 14,
    [1] + [0] * 14 + [1],
    [0, 1] + [2] * 14,
    [0] + [1] * 14 + [0],
    [0, 99] + [100] * 13,
])
def test_roundtrip_delta_shapes(longs):
    roundtrip(longs, True, True)
    roundtrip(longs, True, False)


# --- from Java source, with expected encoded lengths (Test.cs:233-307) --


def test_roundtrip_fixed_delta_zero():
    roundtrip([123] * 5120, True, False, expected_len=50)


def test_roundtrip_fixed_delta_one():
    roundtrip([i % 512 for i in range(5120)], True, False, expected_len=40)


def test_roundtrip_fixed_delta_one_descending():
    roundtrip([512 - (i % 512) for i in range(5120)], True, False, expected_len=50)


def test_roundtrip_fixed_delta_large():
    roundtrip([i % 512 + (i % 512) * 100 for i in range(5120)], True, False, expected_len=50)


def test_roundtrip_fixed_delta_large_descending():
    roundtrip([(512 - i % 512) + (i % 512) * 100 for i in range(5120)], True, False, expected_len=60)


def test_roundtrip_short_repeat_b():
    roundtrip([10] * 5, True, False, expected_len=2)


def test_roundtrip_unknown_sign():
    roundtrip([0] + list(range(511)), True, False, expected_len=642)


def test_roundtrip_patched_base_seeded():
    # C# Random(123).Next() % (i+1) — exact sequence reproduced via the ported
    # .NET PRNG in tests/dotnet_random.py
    from dotnet_random import DotNetRandom

    rng = DotNetRandom(123)
    longs = [10000000] + [rng.next() % (i + 1) for i in range(511)]
    roundtrip(longs, True, False, expected_len=583)


def test_roundtrip_basic_new():
    longs = [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 3, 4, 5, 6,
             7, 8, 9, 10, 1, 1, 1, 1, 1, 1, 10, 9, 7, 6, 5,
             4, 3, 2, 1, 1, 1, 1, 1, 2, 5, 1, 3, 7, 1, 9, 2,
             6, 3, 7, 1, 9, 2, 6, 3, 7, 1, 9, 2, 6, 3, 7, 1,
             9, 2, 6, 3, 7, 1, 9, 2, 6, 2000, 2, 1, 1, 1, 1,
             1, 3, 7, 1, 9, 2, 6, 1, 1, 1, 1, 1]
    roundtrip(longs, True, False)


@pytest.mark.parametrize("longs", [
    [-500, -400, -350, -325, -310],
    [-500, -600, -650, -675, -710],
    [500, 400, 350, 325, 310],
    [500, 600, 650, 675, 710],
])
def test_roundtrip_basic_delta(longs):
    roundtrip(longs, True, False)


@pytest.mark.parametrize("longs", [
    [4513343538618202719, 4513343538618202711, 2911390882471569739, -9181829309989854913],
    [2**63 - 1, 4513343538618202711, 2911390882471569739, -2**63],
    [-4513343538618202711, -2911390882471569739, -2, 2**63 - 1],
])
def test_roundtrip_delta_overflow(longs):
    roundtrip(longs, True, False)


@pytest.mark.parametrize("value", [-(2**31), 2**31 - 1, -(2**63), 2**63 - 1])
def test_roundtrip_extremes(value):
    roundtrip([value], True, False)


def test_roundtrip_random_int():
    rng = np.random.default_rng(20260817)
    longs = rng.integers(0, 2**31, size=100000, dtype=np.int64)
    roundtrip(longs.tolist(), True, False)


def test_roundtrip_random_long():
    rng = np.random.default_rng(20260818)
    longs = rng.integers(-(2**63), 2**63, size=100000, dtype=np.int64)
    roundtrip(longs.tolist(), True, False)


_NEG_MIN_BASE = [
    20, 2, 3, 2, 1, 3, 17, 71, 35, 2, 1, 139, 2, 2, 3, 1783, 475, 2, 1,
    1, 3, 1, 3, 2, 32, 1, 2, 3, 1, 8, 30, 1, 3, 414, 1, 1, 135, 3, 3, 1,
    414, 2, 1, 2, 2, 594, 2, 5, 6, 4, 11, 1, 2, 2, 1, 1, 52, 4, 1, 2, 7,
    1, 17, 334, 1, 2, 1, 2, 2, 6, 1, 266, 1, 2, 217, 2, 6, 2, 13, 2, 2,
    1, 2, 3, 5, 1, 2, 1, 7244, 11813, 1, 33, 2]
_NEG_MIN_TAIL = [
    1, 2, 3, 13, 1, 92, 3, 13, 5, 14, 9, 141, 12, 6, 15, 25, 1, 1, 1, 46,
    2, 1, 1, 141, 3, 1, 1, 1, 1, 2, 1, 4, 34, 5, 78, 8, 1, 2, 2, 1, 9, 10,
    2, 1, 4, 13, 1, 5, 4, 4, 19, 5, 1, 1, 1, 68, 33, 399, 1, 1885, 25, 5,
    2, 4, 1, 1, 2, 16, 1, 2966, 3, 1, 1, 25501, 1, 1, 1, 66, 1, 3, 8, 131,
    14, 5, 1, 2, 2, 1, 1, 8, 1, 1, 2, 1, 5, 9, 2, 3, 112, 13, 2, 2, 1, 5,
    10, 3, 1, 1, 13, 2, 3, 4, 1, 3, 1, 1, 2, 1, 1, 2, 4, 2, 207, 1, 1, 2,
    4, 3, 3, 2, 2, 16]


@pytest.mark.parametrize("middle", [-13, -1, 0])
def test_roundtrip_patched_base_negative_min(middle):
    roundtrip(_NEG_MIN_BASE + [middle] + _NEG_MIN_TAIL, True, False)


def test_roundtrip_patched_base_negative_min4():
    longs = [13, 13, 11, 8, 13, 10, 10, 11, 11, 14, 11, 7, 13, 12, 12, 11, 15, 12,
             12, 9, 8, 10, 13, 11, 8, 6, 5, 6, 11, 7, 15, 10, 7, 6, 8, 7, 9, 9, 11,
             33, 11, 3, 7, 4, 6, 10, 14, 12, 5, 14, 7, 6]
    roundtrip(longs, True, False)


@pytest.mark.parametrize("at", [0, 1, 255, 256, 510, 511])
def test_roundtrip_patched_base_at(at):
    rng = np.random.default_rng(at)
    longs = rng.integers(0, 100, size=5120, dtype=np.int64)
    longs[at] = 20000
    roundtrip(longs.tolist(), True, False)


def test_roundtrip_patched_base_max():
    rng = np.random.default_rng(7)
    longs = rng.integers(0, 60, size=5120, dtype=np.int64)
    longs[511] = 2**63 - 1
    roundtrip(longs.tolist(), True, False)
    longs[128] = 2**63 - 1
    longs[256] = 2**63 - 1
    roundtrip(longs.tolist(), True, False)


def test_roundtrip_patched_base_max3():
    longs = [371946367, 11963367, 68639400007, 100233367, 6367, 10026367,
             3670000, 3602367, 4719226367, 7196367, 444442, 210267, 21033,
             160267, 400267, 23634347, 16027, 46026367, 2**63 - 1, 33333]
    roundtrip(longs, True, False)


def test_roundtrip_patched_base_max4():
    seq = [371292224226367, 119622332222267, 686329400222007, 100233333222367,
           636272333322222, 10202633223267, 36700222022230, 36023226224227,
           47192226364427, 71963622222447, 22244444222222, 21220263327442,
           21032233332232, 16026322232227, 40022262272212, 23634342227222,
           16022222222227, 46026362222227, 46026362222227, 33322222222323]
    roundtrip(seq * 25 + [2**63 - 1], True, False)


def test_roundtrip_direct_large_negatives():
    roundtrip([-7486502418706614742, 0, 1, 1, -5535739865598783616], True, False)


def test_sr_stream_bytes_match_scalar_path():
    """The vectorized SHORT_REPEAT stream must emit byte-identical output to
    the scalar window cascade (greedy 512-window semantics, Writer.cs:19-28)."""
    import numpy as np

    from apacheorcdotnet_ray.codecs import rlev2

    rng = np.random.default_rng(17)
    v = np.repeat(rng.integers(-(2**40), 2**40, 5000),
                  rng.integers(1, 14, 5000)).astype(np.int64)

    def scalar_encode(values, signed, aligned=False):
        out = bytearray()
        pos = 0
        while pos < len(values):
            pos += rlev2._encode_window(out, values[pos : pos + 512], signed, aligned)
        return bytes(out)

    for signed in (True, False):
        fast = rlev2.encode(v, signed)
        slow = scalar_encode(v, signed)
        assert fast == slow
        assert np.array_equal(rlev2.decode(fast, signed, len(v)), v)


def test_batched_encoder_bytes_match_scalar_path_all_shapes():
    import numpy as np

    from apacheorcdotnet_ray.codecs import rlev2

    def scalar_encode(values, signed, aligned=False):
        out = bytearray()
        pos = 0
        while pos < len(values):
            pos += rlev2._encode_window(out, values[pos : pos + 512], signed, aligned)
        return bytes(out)

    rng = np.random.default_rng(23)
    shapes = {
        "random": rng.integers(-(2**31), 2**31, 20_000),
        "clustered+outliers": np.where(rng.random(20_000) < 0.04,
                                       rng.integers(0, 2**45, 20_000),
                                       rng.integers(1000, 2000, 20_000)),
        "monotonic": np.cumsum(rng.integers(0, 100, 20_000)),
        "descending": -np.cumsum(rng.integers(0, 100, 20_000)),
        "const-blocks": np.repeat(rng.integers(0, 10, 50), 400),
        "near-minmax": rng.choice([2**63 - 1, -(2**63), 0, 1, -1], 20_000),
    }
    for name, v in shapes.items():
        v = v.astype(np.int64)
        for aligned in (False, True):
            for signed in (True, False):
                fast = rlev2.encode(v, signed, aligned)
                slow = scalar_encode(v, signed, aligned)
                assert fast == slow, (name, signed, aligned)
