"""Pure-python H.264 CAVLC intra tier: entropy-coded I-slice decode.

Round 7 closes the gap between the I_PCM tier (operators/h264.py —
lossless but ~8x the raw size) and real web-crawl H.264: baseline
INTRA pictures coded with CAVLC entropy, the 4x4 integer transform,
and full spatial prediction (I_4x4 all 9 modes, I_16x16 all 4 modes,
chroma DC/H/V/Plane).  With this module, `decode_h264_annexb`
decodes any baseline I-slice stream that (a) uses CAVLC (baseline
profile has no CABAC) and (b) disables the deblocking filter — which
is exactly what the encoder twin `encode_h264_intra` emits, and what
intra-only archival/“allintra” encodes look like.  (P slices decode
too via operators/h264_inter + decode_slice's P branch.)  Streams with deblocking enabled raise
NotImplementedError naming the PyAV tier (the pure tier is
exact-or-refuse: an undeblocked approximation of a deblocked stream
would silently differ from a conformant decoder).

Validation strategy (the JPEG/GIF encoder-twin discipline,
multimodal.py tiers):

* The VLC tables below are transcribed ONCE from the published spec
  tables (ITU-T H.264 §9.2, Tables 9-4 .. 9-10) as literal bit
  strings laid out in spec order, so a reviewer can diff them against
  the standard line by line.
* `tests/test_h264_cavlc.py` pins structural invariants the real
  tables satisfy — every VLC table must be prefix-free, and the
  Kraft sums must match the spec's (complete or deliberately
  incomplete per table) — plus exhaustive round-trips through every
  (TotalCoeff, TrailingOnes, nC-class) cell.
* Decode-vs-encoder-reconstruction is pinned EXACTLY: the encoder
  reconstructs through the same dequant + inverse-transform path a
  decoder runs (closed-loop intra prediction), so `decode(encode(x))`
  must equal the encoder's reconstruction bit-for-bit; any drift is a
  hard failure, not a PSNR shrug.
* When PyAV is importable the env-gated cross-check in
  tests/test_multimodal.py decodes the twin's output with
  libavcodec and compares frames bit-exactly — a true conformance
  vector in any PyAV-equipped environment (this container has none).

Scale posture: this runs inside Arrow `mapInPandas` batches like every
other codec in operators/multimodal.py — per-document Python cost,
no shuffle implications.  The bit-serial CAVLC loop is fixture- and
probe-scale; corpora decode keyframes selectively (demux + keyframe
index are free), and the PyAV tier remains the bulk-decode path when
a codec library is available.

Spec grounding: ITU-T H.264 (08/2021) §7.3.5 (macroblock syntax),
§7.4.5 (mb_type tables), §8.3 (intra prediction), §8.5 (transform /
quantisation), §9.1 (exp-Golomb incl. the Table 9-4 me(v) mapping),
§9.2 (CAVLC).  Reference context: the reference repo has no media
surface — extended training-data-pipeline tier (SURVEY.md Phase 5).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Table 9-4: codeNum → coded_block_pattern for me(v), Intra_4x4 column.
# Laid out in codeNum order exactly as printed in the spec.
# ---------------------------------------------------------------------------
CBP_INTRA_FROM_CODENUM = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
CODENUM_FROM_CBP_INTRA = {
    cbp: n for n, cbp in enumerate(CBP_INTRA_FROM_CODENUM)
}

# ---------------------------------------------------------------------------
# Table 9-5: coeff_token bit strings, keyed (TotalCoeff, TrailingOnes),
# one dict per nC class.  Spec layout: rows in (TrailingOnes,
# TotalCoeff) order; transcribed here grouped by TotalCoeff for
# compactness.  '-' rows (forbidden) are simply absent.
# ---------------------------------------------------------------------------
COEFF_TOKEN_NC_0_2 = {  # 0 <= nC < 2
    (0, 0): "1",
    (1, 0): "000101", (1, 1): "01",
    (2, 0): "00000111", (2, 1): "000100", (2, 2): "001",
    (3, 0): "000000111", (3, 1): "00000110", (3, 2): "0000101",
    (3, 3): "00011",
    (4, 0): "0000000111", (4, 1): "000000110", (4, 2): "00000101",
    (4, 3): "000011",
    (5, 0): "00000000111", (5, 1): "0000000110", (5, 2): "000000101",
    (5, 3): "0000100",
    (6, 0): "0000000001111", (6, 1): "00000000110", (6, 2): "0000000101",
    (6, 3): "00000100",
    (7, 0): "0000000001011", (7, 1): "0000000001110",
    (7, 2): "00000000101", (7, 3): "000000100",
    (8, 0): "0000000001000", (8, 1): "0000000001010",
    (8, 2): "0000000001101", (8, 3): "0000000100",
    (9, 0): "00000000001111", (9, 1): "00000000001110",
    (9, 2): "0000000001001", (9, 3): "00000000100",
    (10, 0): "00000000001011", (10, 1): "00000000001010",
    (10, 2): "00000000001101", (10, 3): "0000000001100",
    (11, 0): "000000000001111", (11, 1): "000000000001110",
    (11, 2): "00000000001001", (11, 3): "00000000001100",
    (12, 0): "000000000001011", (12, 1): "000000000001010",
    (12, 2): "000000000001101", (12, 3): "00000000001000",
    (13, 0): "0000000000001111", (13, 1): "000000000000001",
    (13, 2): "000000000001001", (13, 3): "000000000001100",
    (14, 0): "0000000000001011", (14, 1): "0000000000001110",
    (14, 2): "0000000000001101", (14, 3): "000000000001000",
    (15, 0): "0000000000000111", (15, 1): "0000000000001010",
    (15, 2): "0000000000001001", (15, 3): "0000000000001100",
    (16, 0): "0000000000000100", (16, 1): "0000000000000110",
    (16, 2): "0000000000000101", (16, 3): "0000000000001000",
}

COEFF_TOKEN_NC_2_4 = {  # 2 <= nC < 4
    (0, 0): "11",
    (1, 0): "001011", (1, 1): "10",
    (2, 0): "000111", (2, 1): "00111", (2, 2): "011",
    (3, 0): "0000111", (3, 1): "001010", (3, 2): "001001",
    (3, 3): "0101",
    (4, 0): "00000111", (4, 1): "000110", (4, 2): "000101",
    (4, 3): "0100",
    (5, 0): "00000100", (5, 1): "0000110", (5, 2): "0000101",
    (5, 3): "00110",
    (6, 0): "000000111", (6, 1): "00000110", (6, 2): "00000101",
    (6, 3): "001000",
    (7, 0): "00000001111", (7, 1): "000000110", (7, 2): "000000101",
    (7, 3): "000100",
    (8, 0): "00000001011", (8, 1): "00000001110", (8, 2): "00000001101",
    (8, 3): "0000100",
    (9, 0): "000000001111", (9, 1): "00000001010", (9, 2): "00000001001",
    (9, 3): "000000100",
    (10, 0): "000000001011", (10, 1): "000000001110",
    (10, 2): "000000001101", (10, 3): "00000001100",
    (11, 0): "000000001000", (11, 1): "000000001010",
    (11, 2): "000000001001", (11, 3): "00000001000",
    (12, 0): "0000000001111", (12, 1): "0000000001110",
    (12, 2): "0000000001101", (12, 3): "000000001100",
    (13, 0): "0000000001011", (13, 1): "0000000001010",
    (13, 2): "0000000001001", (13, 3): "0000000001100",
    (14, 0): "0000000000111", (14, 1): "00000000001011",
    (14, 2): "0000000000110", (14, 3): "0000000001000",
    (15, 0): "00000000001001", (15, 1): "00000000001000",
    (15, 2): "00000000001010", (15, 3): "0000000000001",
    (16, 0): "00000000000111", (16, 1): "00000000000110",
    (16, 2): "00000000000101", (16, 3): "00000000000100",
}

COEFF_TOKEN_NC_4_8 = {  # 4 <= nC < 8
    (0, 0): "1111",
    (1, 0): "001111", (1, 1): "1110",
    (2, 0): "001011", (2, 1): "01111", (2, 2): "1101",
    (3, 0): "001000", (3, 1): "01100", (3, 2): "01110", (3, 3): "1100",
    (4, 0): "0001111", (4, 1): "01010", (4, 2): "01011", (4, 3): "1011",
    (5, 0): "0001011", (5, 1): "01000", (5, 2): "01001", (5, 3): "1010",
    (6, 0): "0001001", (6, 1): "001110", (6, 2): "001101", (6, 3): "1001",
    (7, 0): "0001000", (7, 1): "001010", (7, 2): "001001", (7, 3): "1000",
    (8, 0): "00001111", (8, 1): "0001110", (8, 2): "0001101",
    (8, 3): "01101",
    (9, 0): "00001011", (9, 1): "00001110", (9, 2): "0001010",
    (9, 3): "001100",
    (10, 0): "000001111", (10, 1): "00001010", (10, 2): "00001101",
    (10, 3): "0001100",
    (11, 0): "000001011", (11, 1): "000001110", (11, 2): "00001001",
    (11, 3): "00001100",
    (12, 0): "000001000", (12, 1): "000001010", (12, 2): "000001101",
    (12, 3): "00001000",
    (13, 0): "0000001101", (13, 1): "000000111", (13, 2): "000001001",
    (13, 3): "000001100",
    (14, 0): "0000001001", (14, 1): "0000001100", (14, 2): "0000001011",
    (14, 3): "0000001010",
    (15, 0): "0000000101", (15, 1): "0000001000", (15, 2): "0000000111",
    (15, 3): "0000000110",
    (16, 0): "0000000001", (16, 1): "0000000100", (16, 2): "0000000011",
    (16, 3): "0000000010",
}

COEFF_TOKEN_CHROMA_DC = {  # nC == -1 (4:2:0 chroma DC, 4 coeffs max)
    (0, 0): "01",
    (1, 0): "000111", (1, 1): "1",
    (2, 0): "000100", (2, 1): "000110", (2, 2): "001",
    (3, 0): "000011", (3, 1): "0000011", (3, 2): "0000010",
    (3, 3): "000101",
    (4, 0): "000010", (4, 1): "00000011", (4, 2): "00000010",
    (4, 3): "0000000",
}

# ---------------------------------------------------------------------------
# Tables 9-7 / 9-8: total_zeros for 4x4 blocks, keyed by
# TotalCoeff (1..15); each row maps total_zeros value → bits.
# ---------------------------------------------------------------------------
TOTAL_ZEROS_4x4 = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011",
        "0010", "00011", "00010", "000011", "000010", "000001",
        "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011",
        "0010", "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011",
        "011", "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011",
        "0010", "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001",
        "001", "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

# Table 9-9 (a): total_zeros for chroma DC (4:2:0), TotalCoeff 1..3.
TOTAL_ZEROS_CHROMA_DC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# ---------------------------------------------------------------------------
# Table 9-10: run_before, keyed by min(zerosLeft, 7); value → bits.
# zerosLeft >= 7 appends unary 1s beyond run_before 6 (the spec's
# '11' .. escape: run_before 7..14 code '0001' padded — handled in
# code: values 7.. use 11 -> ... see _read/_write_run_before).
# ---------------------------------------------------------------------------
RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    # zerosLeft > 6: values 0..6 as the 3-bit codes below, then
    # run_before = 7..14 coded as '0001' .. '00000000001' (unary
    # zero-extension, spec Table 9-10 rightmost column)
    7: ["111", "110", "101", "100", "011", "010", "001"],
}


def _invert(table: dict) -> dict:
    """bit-string keyed decode map {bits: value} from {value: bits}."""
    return {bits: key for key, bits in table.items()}


_COEFF_TOKEN_DECODE = {
    0: _invert(COEFF_TOKEN_NC_0_2),
    2: _invert(COEFF_TOKEN_NC_2_4),
    4: _invert(COEFF_TOKEN_NC_4_8),
    -1: _invert(COEFF_TOKEN_CHROMA_DC),
}


def _coeff_token_table(nC: int):
    if nC == -1:
        return COEFF_TOKEN_CHROMA_DC
    if nC < 2:
        return COEFF_TOKEN_NC_0_2
    if nC < 4:
        return COEFF_TOKEN_NC_2_4
    if nC < 8:
        return COEFF_TOKEN_NC_4_8
    return None  # FLC


def _read_vlc(r, decode_map: dict, what: str):
    """Read one prefix code from the bit reader using a {bits: value}
    map.  Bounded at 16 bits (longest CAVLC codeword)."""
    bits = ""
    for _ in range(19):
        bits += "1" if r.u(1) else "0"
        if bits in decode_map:
            return decode_map[bits]
    raise ValueError(f"invalid CAVLC {what} code: {bits}")


def read_coeff_token(r, nC: int) -> tuple[int, int]:
    """(TotalCoeff, TrailingOnes) — spec 9.2.1."""
    if nC >= 8:  # 6-bit FLC: coeff_token = (TotalCoeff-1)<<2 | T1s,
        # with 000011 reserved for TotalCoeff == 0
        code = r.u(6)
        if code == 0b000011:
            return 0, 0
        return (code >> 2) + 1, code & 3
    key = -1 if nC == -1 else (0 if nC < 2 else (2 if nC < 4 else 4))
    return _read_vlc(r, _COEFF_TOKEN_DECODE[key], "coeff_token")


def write_coeff_token(w, nC: int, total_coeff: int, trailing_ones: int):
    table = _coeff_token_table(nC)
    if table is None:
        if total_coeff == 0:
            w.u(0b000011, 6)
        else:
            w.u(((total_coeff - 1) << 2) | trailing_ones, 6)
        return
    bits = table[(total_coeff, trailing_ones)]
    for b in bits:
        w.u(1 if b == "1" else 0, 1)


def _write_bits(w, bits: str):
    for b in bits:
        w.u(1 if b == "1" else 0, 1)


# ---------------------------------------------------------------------------
# Level coding (9.2.2): level_prefix (unary) + level_suffix.
# ---------------------------------------------------------------------------
def _read_level(r, suffix_length: int) -> int:
    """9.2.2.1/9.2.2.2: level_prefix (unary zeros) + level_suffix →
    signed level.  The caller applies the first-coefficient
    displacement and the suffixLength adaptation."""
    prefix = 0
    while r.u(1) == 0:
        prefix += 1
        if prefix > 32:
            raise ValueError("malformed CAVLC level_prefix")
    if prefix == 14 and suffix_length == 0:
        suffix_size = 4
    elif prefix >= 15:
        suffix_size = prefix - 3
    else:
        suffix_size = suffix_length
    suffix = r.u(suffix_size) if suffix_size else 0
    level_code = (min(15, prefix) << suffix_length) + suffix
    if prefix >= 15 and suffix_length == 0:
        level_code += 15
    if prefix >= 16:
        level_code += (1 << (prefix - 3)) - 4096
    if level_code % 2 == 0:
        return (level_code + 2) >> 1
    return -((level_code + 1) >> 1)


def _write_level(w, level: int, suffix_length: int):
    """Inverse of _read_level.  Levels beyond the prefix-15 escape
    (12-bit suffix) would need prefix >= 16; the encoder twin
    quantises well inside that range and refuses rather than emit
    bits its own decoder pins — decode still handles prefix >= 16."""
    level_code = (2 * level - 2) if level > 0 else (-2 * level - 1)
    if suffix_length == 0:
        if level_code < 14:
            _write_bits(w, "0" * level_code + "1")
        elif level_code < 30:
            _write_bits(w, "0" * 14 + "1")
            w.u(level_code - 14, 4)
        elif level_code - 30 < 4096:
            _write_bits(w, "0" * 15 + "1")
            w.u(level_code - 30, 12)
        else:
            raise ValueError("CAVLC level beyond the prefix-15 escape")
    else:
        if (level_code >> suffix_length) < 15:
            prefix = level_code >> suffix_length
            _write_bits(w, "0" * prefix + "1")
            w.u(level_code & ((1 << suffix_length) - 1), suffix_length)
        elif level_code - (15 << suffix_length) < 4096:
            _write_bits(w, "0" * 15 + "1")
            w.u(level_code - (15 << suffix_length), 12)
        else:
            raise ValueError("CAVLC level beyond the prefix-15 escape")


# ---------------------------------------------------------------------------
# 9.2.3: total_zeros + run_before
# ---------------------------------------------------------------------------
_TZ_4x4_DECODE = {tc: _invert(dict(enumerate(v))) for tc, v in
                  TOTAL_ZEROS_4x4.items()}
_TZ_CDC_DECODE = {tc: _invert(dict(enumerate(v))) for tc, v in
                  TOTAL_ZEROS_CHROMA_DC.items()}
_RB_DECODE = {zl: _invert(dict(enumerate(v))) for zl, v in
              RUN_BEFORE.items()}


def _read_run_before(r, zeros_left: int) -> int:
    zl = min(zeros_left, 7)
    if zl < 7:
        return _read_vlc(r, _RB_DECODE[zl], "run_before")
    # zerosLeft > 6: 3-bit codes for 0..6, then unary-extended zeros
    bits = ""
    for _ in range(3):
        bits += "1" if r.u(1) else "0"
    if bits in _RB_DECODE[7]:
        return _RB_DECODE[7][bits]
    if bits != "000":
        raise ValueError("invalid run_before code")
    run = 7
    while r.u(1) == 0:
        run += 1
        if run > 14:
            raise ValueError("run_before over 14")
    return run


def _write_run_before(w, run: int, zeros_left: int):
    zl = min(zeros_left, 7)
    if zl < 7:
        _write_bits(w, RUN_BEFORE[zl][run])
        return
    if run < 7:
        _write_bits(w, RUN_BEFORE[7][run])
        return
    # 7..14: '000' + (run-7) zeros + terminating 1 … except run == 14
    # is all zeros to the 11-bit maximum ('00000000001' is run 14)
    _write_bits(w, "000" + "0" * (run - 7) + "1")


def decode_residual_block(r, nC: int, max_coeffs: int) -> list[int]:
    """9.2: one CAVLC residual block → `max_coeffs` levels in
    scan order (zigzag for the caller to place).  Returns the list and
    the caller records TotalCoeff for neighbour nC bookkeeping via
    len-nonzero convention — we return (levels, total_coeff)."""
    total_coeff, trailing_ones = read_coeff_token(r, nC)
    levels = [0] * max_coeffs
    if total_coeff == 0:
        return levels, 0
    # levels, highest frequency first
    lv = []
    for i in range(trailing_ones):
        lv.append(1 - 2 * r.u(1))  # sign bit: 0 → +1, 1 → -1
    suffix_length = 1 if total_coeff > 10 and trailing_ones < 3 else 0
    for i in range(trailing_ones, total_coeff):
        level = _read_level(r, suffix_length)
        if i == trailing_ones and trailing_ones < 3:
            # spec 9.2.2.1: the first non-T1 level is displaced by one
            level += 1 if level > 0 else -1
        lv.append(level)
        if suffix_length == 0:
            suffix_length = 1
        if abs(level) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1
    # total_zeros
    if total_coeff < max_coeffs:
        if nC == -1:
            total_zeros = _read_vlc(
                r, _TZ_CDC_DECODE[total_coeff], "total_zeros"
            )
        else:
            total_zeros = _read_vlc(
                r, _TZ_4x4_DECODE[total_coeff], "total_zeros"
            )
    else:
        total_zeros = 0
    if total_coeff + total_zeros > max_coeffs:
        # Table 9-7 rows are shared between 16- and 15-coefficient
        # blocks, so a corrupt stream can code a total_zeros the AC
        # block cannot hold (spec 7.4.5.3.3 bounds it to
        # maxNumCoeff - TotalCoeff) — fail closed
        raise ValueError("total_zeros exceeds block capacity")
    # run_before per coefficient, highest frequency first; the last
    # (lowest-frequency) coefficient takes whatever zeros remain
    zeros_left = total_zeros
    pos = total_coeff - 1 + total_zeros  # scan index, highest-freq coeff
    for i, level in enumerate(lv):
        levels[pos] = level
        if i < total_coeff - 1:
            run = _read_run_before(r, zeros_left) if zeros_left > 0 else 0
            if run > zeros_left:
                # spec 9.2.3: run_before shall not exceed zerosLeft —
                # only the zl>6 unary escape can even encode such a
                # value; without this check the scan index would go
                # negative and silently wrap into the wrong slot
                raise ValueError("run_before exceeds zerosLeft")
            zeros_left -= run
            pos -= 1 + run
    return levels, total_coeff


def encode_residual_block(w, levels: list[int], nC: int) -> int:
    """Inverse of decode_residual_block; returns TotalCoeff for
    neighbour bookkeeping."""
    max_coeffs = len(levels)
    nz = [(i, v) for i, v in enumerate(levels) if v != 0]
    total_coeff = len(nz)
    # trailing ones: up to 3 consecutive +-1 at the high-frequency end
    trailing_ones = 0
    for i in range(total_coeff - 1, -1, -1):
        if abs(nz[i][1]) == 1 and trailing_ones < 3:
            trailing_ones += 1
        else:
            break
    write_coeff_token(w, nC, total_coeff, trailing_ones)
    if total_coeff == 0:
        return 0
    highest_first = [v for _i, v in reversed(nz)]
    for i in range(trailing_ones):
        w.u(0 if highest_first[i] > 0 else 1, 1)
    suffix_length = 1 if total_coeff > 10 and trailing_ones < 3 else 0
    for i in range(trailing_ones, total_coeff):
        level = highest_first[i]
        if i == trailing_ones and trailing_ones < 3:
            level += -1 if level > 0 else 1
        _write_level(w, level, suffix_length)
        if suffix_length == 0:
            suffix_length = 1
        # decoder adapts on the DECODED level (pre-displacement slot i)
        dec_level = highest_first[i]
        if abs(dec_level) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1
    last_idx = nz[-1][0]
    total_zeros = last_idx + 1 - total_coeff
    if total_coeff < max_coeffs:
        if nC == -1:
            _write_bits(w, TOTAL_ZEROS_CHROMA_DC[total_coeff][total_zeros])
        else:
            _write_bits(w, TOTAL_ZEROS_4x4[total_coeff][total_zeros])
    zeros_left = total_zeros
    positions = [i for i, _v in reversed(nz)]
    for i in range(total_coeff - 1):
        run = positions[i] - positions[i + 1] - 1
        if zeros_left > 0:
            _write_run_before(w, run, zeros_left)
            zeros_left -= run
        # zeros_left == 0 → all remaining runs are 0, nothing coded
    return total_coeff


# ---------------------------------------------------------------------------
# Scans, quantisation tables (8.5): JM-style formulation — dequant
# multiplies by V << (QP/6) and the inverse transform carries the
# final (x + 32) >> 6 normalisation.
# ---------------------------------------------------------------------------
#: zigzag scan position k → raster index in the 4x4 block (Table 8-12)
ZIGZAG_4x4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

#: dequant scale V (spec LevelScale4x4 for the flat default matrix),
#: rows QP%6, columns [positions (0,0)-class, (1,1)-class, other]
DEQUANT_V = [
    (10, 16, 13), (11, 18, 14), (13, 20, 16),
    (14, 23, 18), (16, 25, 20), (18, 29, 23),
]
#: forward quant multiplier MF, same layout (encoder side)
QUANT_MF = [
    (13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
    (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559),
]
#: raster position (i, j) → V/MF column
_POS_CLASS = [
    0, 2, 0, 2,
    2, 1, 2, 1,
    0, 2, 0, 2,
    2, 1, 2, 1,
]

#: Table 8-15: qPi → QPc for chroma
QPC_TABLE = list(range(30)) + [
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
    36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39,
]


def _np():
    import numpy as np

    return np


#: lazy module-level numpy constants for the hot transform/quant
#: kernels (r13, guide §4.2: the per-call np.array construction and
#: the 16-iteration scalar-indexing loops dominated the codec's
#: per-macroblock cost; hoisting tables + whole-block vector ops is
#: bit-identical integer math)
_NPC = None


def _npc():
    global _NPC
    if _NPC is None:
        np = _np()
        zz = np.array(ZIGZAG_4x4, dtype=np.intp)
        cls_scan = [_POS_CLASS[p] for p in ZIGZAG_4x4]
        _NPC = {
            "zz": zz,
            # per-(QP%6) multiplier vectors in SCAN order
            "mf_scan": np.array(
                [[QUANT_MF[m][c] for c in cls_scan] for m in range(6)],
                dtype=np.int64,
            ),
            "v_scan": np.array(
                [[DEQUANT_V[m][c] for c in cls_scan] for m in range(6)],
                dtype=np.int64,
            ),
            "cf": np.array(
                [[1, 1, 1, 1], [2, 1, -1, -2],
                 [1, -1, -1, 1], [1, -2, 2, -1]],
                dtype=np.int64,
            ),
            "h4": np.array(
                [[1, 1, 1, 1], [1, 1, -1, -1],
                 [1, -1, -1, 1], [1, -1, 1, -1]],
                dtype=np.int64,
            ),
            "h2": np.array([[1, 1], [1, -1]], dtype=np.int64),
        }
    return _NPC


def dequant_4x4(levels16, qp: int, skip_dc: bool = False):
    """Scan-ordered levels → raster 4x4 dequantised coefficients
    (JM form: c * V[qp%6][class] << qp//6)."""
    np = _np()
    c = _npc()
    m, shift = qp % 6, qp // 6
    lv = np.asarray(levels16, dtype=np.int64)
    vals = (lv * c["v_scan"][m]) << shift
    if skip_dc:
        vals[0] = 0  # scan position 0 is the raster DC
    d = np.zeros(16, dtype=np.int64)
    d[c["zz"]] = vals
    return d.reshape(4, 4)


def inverse_transform_4x4(d):
    """8.5.12.2 inverse core transform + (x+32)>>6 normalisation.
    d is a raster 4x4 int array of dequantised coefficients; returns
    the 4x4 residual."""
    np = _np()
    d = d.astype(np.int64)
    # horizontal (rows of d are frequency rows; spec operates columns
    # then rows — the transform is symmetric in this butterfly form)
    e0 = d[0] + d[2]
    e1 = d[0] - d[2]
    e2 = (d[1] >> 1) - d[3]
    e3 = d[1] + (d[3] >> 1)
    f = np.empty((4, 4), dtype=np.int64)
    f[0] = e0 + e3
    f[1] = e1 + e2
    f[2] = e1 - e2
    f[3] = e0 - e3
    g0 = f[:, 0] + f[:, 2]
    g1 = f[:, 0] - f[:, 2]
    g2 = (f[:, 1] >> 1) - f[:, 3]
    g3 = f[:, 1] + (f[:, 3] >> 1)
    h = np.empty((4, 4), dtype=np.int64)
    h[:, 0] = g0 + g3
    h[:, 1] = g1 + g2
    h[:, 2] = g1 - g2
    h[:, 3] = g0 - g3
    return (h + 32) >> 6


def forward_transform_4x4(x):
    """Cf · X · CfT (8.5 forward core, encoder side)."""
    np = _np()
    cf = _npc()["cf"]
    return cf @ x.astype(np.int64) @ cf.T


# ---------------------------------------------------------------------------
# Batched whole-macroblock variants (r13, guide §4.2): identical
# integer arithmetic applied to an (n, 4, 4) stack at once — one numpy
# dispatch instead of n. Callers that loop 16 blocks per macroblock
# (forward transform + quant on the encoder side, dequant + inverse on
# the reconstruction side) spend most of their time in per-call numpy
# overhead at this block size; stream parity is pinned by the
# byte-identity tests against the scalar forms.
# ---------------------------------------------------------------------------
def forward_transform_4x4_batch(blocks):
    """(n, 4, 4) residual blocks → (n, 4, 4) transform coefficients;
    same math as forward_transform_4x4 per block."""
    np = _np()
    cf = _npc()["cf"]
    return cf[None] @ blocks.astype(np.int64) @ cf.T[None]


def quant_4x4_batch(wt, qp: int, skip_dc: bool = False):
    """(n, 4, 4) coefficients → list of n scan-ordered level lists;
    same math as quant_4x4 per block."""
    np = _np()
    tabs = _npc()
    m, qbits = qp % 6, 15 + qp // 6
    f = (1 << qbits) // 3
    c = wt.reshape(-1, 16)[:, tabs["zz"]].astype(np.int64)
    lv = np.minimum((np.abs(c) * tabs["mf_scan"][m][None] + f) >> qbits,
                    _LEVEL_CLAMP)
    np.negative(lv, where=c < 0, out=lv)
    if skip_dc:
        lv[:, 0] = 0
    return lv.tolist()


def dequant_4x4_batch(levels, qp: int, skip_dc: bool = False):
    """(n, 16) scan-ordered levels → (n, 4, 4) dequantised
    coefficients; same math as dequant_4x4 per block."""
    np = _np()
    tabs = _npc()
    m, shift = qp % 6, qp // 6
    lv = np.asarray(levels, dtype=np.int64)
    vals = (lv * tabs["v_scan"][m][None]) << shift
    if skip_dc:
        vals[:, 0] = 0
    d = np.zeros((lv.shape[0], 16), dtype=np.int64)
    d[:, tabs["zz"]] = vals
    return d.reshape(-1, 4, 4)


def inverse_transform_4x4_batch(d):
    """(n, 4, 4) dequantised coefficients → (n, 4, 4) residuals; same
    butterfly as inverse_transform_4x4 per block."""
    np = _np()
    d = d.astype(np.int64)
    e0 = d[:, 0] + d[:, 2]
    e1 = d[:, 0] - d[:, 2]
    e2 = (d[:, 1] >> 1) - d[:, 3]
    e3 = d[:, 1] + (d[:, 3] >> 1)
    f = np.empty_like(d)
    f[:, 0] = e0 + e3
    f[:, 1] = e1 + e2
    f[:, 2] = e1 - e2
    f[:, 3] = e0 - e3
    g0 = f[:, :, 0] + f[:, :, 2]
    g1 = f[:, :, 0] - f[:, :, 2]
    g2 = (f[:, :, 1] >> 1) - f[:, :, 3]
    g3 = f[:, :, 1] + (f[:, :, 3] >> 1)
    h = np.empty_like(d)
    h[:, :, 0] = g0 + g3
    h[:, :, 1] = g1 + g2
    h[:, :, 2] = g1 - g2
    h[:, :, 3] = g0 - g3
    return (h + 32) >> 6


#: luma4x4BlkIdx (Z order) → raster block index by*4+bx, and the
#: 16x16-pixel <-> (16, 4, 4) raster-block reshape helpers the batched
#: macroblock paths share
_BLK_Z2R = None


def _blk_z2r():
    global _BLK_Z2R
    if _BLK_Z2R is None:
        np = _np()
        z2r = np.empty(16, dtype=np.intp)
        for blk in range(16):
            bx, by = _blk_xy(blk)
            z2r[blk] = by * 4 + bx
        _BLK_Z2R = (z2r, np.argsort(z2r))
    return _BLK_Z2R


def mb_to_blocks(mb):
    """(16, 16) macroblock → (16, 4, 4) blocks in Z (luma4x4BlkIdx)
    order."""
    z2r, _ = _blk_z2r()
    return mb.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(
        16, 4, 4
    )[z2r]


def blocks_to_mb(blocks):
    """(16, 4, 4) blocks in Z order → (16, 16) macroblock."""
    _, r2z = _blk_z2r()
    return blocks[r2z].reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(
        16, 16
    )


def hadamard_4x4(x):
    np = _np()
    h = _npc()["h4"]
    return h @ x.astype(np.int64) @ h.T


def hadamard_2x2(x):
    np = _np()
    h = _npc()["h2"]
    return h @ x.astype(np.int64) @ h.T


def dequant_luma_dc(levels16, qp: int):
    """Intra16x16 luma DC: zigzag levels → inverse 4x4 Hadamard →
    scale (8.5.10, JM form)."""
    np = _np()
    c = np.zeros((4, 4), dtype=np.int64)
    for k, lv in enumerate(levels16):
        pos = ZIGZAG_4x4[k]
        c[pos >> 2, pos & 3] = lv
    f = hadamard_4x4(c)
    v0 = DEQUANT_V[qp % 6][0]
    if qp >= 12:
        return (f * v0) << (qp // 6 - 2)
    return (f * v0 + (1 << (1 - qp // 6))) >> (2 - qp // 6)


def dequant_chroma_dc(levels4, qp: int):
    """Chroma DC (4:2:0): raster 2x2 levels → 2x2 Hadamard → scale
    (8.5.11, JM form)."""
    np = _np()
    c = np.array(
        [[levels4[0], levels4[1]], [levels4[2], levels4[3]]],
        dtype=np.int64,
    )
    f = hadamard_2x2(c)
    v0 = DEQUANT_V[qp % 6][0]
    return ((f * v0) << (qp // 6)) >> 1


#: largest level magnitude every CAVLC suffix-length regime can code
#: (level_code 2*4093-ish stays inside the prefix-15 12-bit escape for
#: any suffixLength >= 0); encoder-side clamp, decoder needs none
_LEVEL_CLAMP = 2047


def quant_4x4(w, qp: int, skip_dc: bool = False) -> list[int]:
    """Encoder: raster 4x4 transform coefficients → scan-ordered
    levels (intra deadzone f = qbits/3), clamped to the CAVLC-codable
    range (visible only at very low QP on saturated content; the
    decoder reconstructs from the transmitted level, so the twin
    round-trip stays exact)."""
    np = _np()
    tabs = _npc()
    m, qbits = qp % 6, 15 + qp // 6
    f = (1 << qbits) // 3
    c = w.reshape(16)[tabs["zz"]].astype(np.int64)
    lv = np.minimum((np.abs(c) * tabs["mf_scan"][m] + f) >> qbits,
                    _LEVEL_CLAMP)
    np.negative(lv, where=c < 0, out=lv)
    if skip_dc:
        lv[0] = 0  # scan position 0 is the raster DC
    return lv.tolist()


# ---------------------------------------------------------------------------
# Intra prediction (8.3)
# ---------------------------------------------------------------------------
#: lazy per-mode gather tables for the directional Intra_4x4 modes
#: (r13): each predicted sample is either a 2-tap (a+b+1)>>1 or a
#: 3-tap (a+2b+c+2)>>2 filter over the 13-sample neighbour vector
#: mvec = [l3,l2,l1,l0,tl,t0..t7] (so l[j] = 3-j, tl = 4, t[i] = 5+i);
#: p[3,3] of DDL folds t6+3*t7 into the 3-tap form with a=c=t7, and
#: HU's trailing l[3] copies fold into the 2-tap form with a=b=l3 —
#: bit-identical integer arithmetic, one vector gather per block
#: instead of a 16-iteration Python loop of numpy scalar ops.
_PRED4_TABS = None


def _pred4_tabs():
    global _PRED4_TABS
    if _PRED4_TABS is None:
        np = _np()

        # NOTE: the scalar reference indexes t/l with raw Python
        # subscripts, so a -1 subscript WRAPS (t[-1] == t[7],
        # l[-1] == l[3]); the tables reproduce that wrap exactly —
        # encoder and decoder share this function, so the round-trip
        # is self-consistent either way, and bit-parity with the
        # committed streams is what matters here.
        def _L(j):  # noqa: N802 - index of l[j] in mvec
            return 3 - (j % 4)

        def _T(i):  # noqa: N802 - index of t[i] in mvec
            return 5 + (i % 8)

        _TL = 4
        tabs = {}
        for mode in range(3, 9):
            A = np.zeros((4, 4), dtype=np.intp)
            B = np.zeros((4, 4), dtype=np.intp)
            C = np.zeros((4, 4), dtype=np.intp)
            two = np.zeros((4, 4), dtype=bool)
            for y in range(4):
                for x in range(4):
                    if mode == 3:  # Diagonal-Down-Left
                        if x == 3 and y == 3:
                            a, b, c = _T(6), _T(7), _T(7)
                        else:
                            a, b, c = _T(x + y), _T(x + y + 1), _T(x + y + 2)
                    elif mode == 4:  # Diagonal-Down-Right
                        if x > y:
                            a, b, c = _T(x - y - 2), _T(x - y - 1), _T(x - y)
                        elif x < y:
                            a, b, c = _L(y - x - 2), _L(y - x - 1), _L(y - x)
                        else:
                            a, b, c = _T(0), _TL, _L(0)
                    elif mode == 5:  # Vertical-Right
                        z = 2 * x - y
                        if z >= 0 and z % 2 == 0:
                            a, b, c = _T(x - (y >> 1) - 1), _T(x - (y >> 1)), 0
                            two[y, x] = True
                        elif z >= 0:
                            a, b, c = (_T(x - (y >> 1) - 2),
                                       _T(x - (y >> 1) - 1),
                                       _T(x - (y >> 1)))
                        elif z == -1:
                            a, b, c = _L(0), _TL, _T(0)
                        else:
                            a, b, c = _L(y - 1), _L(y - 2), _L(y - 3)
                    elif mode == 6:  # Horizontal-Down
                        z = 2 * y - x
                        if z >= 0 and z % 2 == 0:
                            a, b, c = _L(y - (x >> 1) - 1), _L(y - (x >> 1)), 0
                            two[y, x] = True
                        elif z >= 0:
                            a, b, c = (_L(y - (x >> 1) - 2),
                                       _L(y - (x >> 1) - 1),
                                       _L(y - (x >> 1)))
                        elif z == -1:
                            a, b, c = _L(0), _TL, _T(0)
                        else:
                            a, b, c = _T(x - 1), _T(x - 2), _T(x - 3)
                    elif mode == 7:  # Vertical-Left
                        i = x + (y >> 1)
                        if y % 2 == 0:
                            a, b, c = _T(i), _T(i + 1), 0
                            two[y, x] = True
                        else:
                            a, b, c = _T(i), _T(i + 1), _T(i + 2)
                    else:  # mode 8, Horizontal-Up
                        z = x + 2 * y
                        q = y + (x >> 1)
                        if z in (0, 2, 4):
                            a, b, c = _L(q), _L(q + 1), 0
                            two[y, x] = True
                        elif z in (1, 3):
                            a, b, c = _L(q), _L(q + 1), _L(q + 2)
                        elif z == 5:
                            a, b, c = _L(2), _L(3), _L(3)
                        else:
                            a, b, c = _L(3), _L(3), 0
                            two[y, x] = True
                    A[y, x], B[y, x], C[y, x] = a, b, c
            tabs[mode] = (A, B, C, two)
        _PRED4_TABS = tabs
    return _PRED4_TABS


def predict_4x4(mode, t, l, tl, have_t, have_l, have_tr):
    """One 4x4 luma prediction.  t: 8 top samples (t[4:] already
    substituted per 8.3.1.2 when top-right is unavailable), l: 4 left,
    tl: corner.  Returns a 4x4 int array; ValueError when `mode`
    needs unavailable neighbours (non-conformant stream)."""
    np = _np()
    if mode == 0:  # Vertical
        if not have_t:
            raise ValueError("Intra_4x4_Vertical without top samples")
        return np.tile(t[:4], (4, 1))
    if mode == 1:  # Horizontal
        if not have_l:
            raise ValueError("Intra_4x4_Horizontal without left samples")
        return np.tile(l.reshape(4, 1), (1, 4))
    if mode == 2:  # DC
        if have_t and have_l:
            v = (int(t[:4].sum()) + int(l.sum()) + 4) >> 3
        elif have_t:
            v = (int(t[:4].sum()) + 2) >> 2
        elif have_l:
            v = (int(l.sum()) + 2) >> 2
        else:
            v = 128
        return np.full((4, 4), v, dtype=np.int64)
    if mode == 3 and not have_t:
        raise ValueError("Intra_4x4_DDL without top samples")
    if mode in (4, 5, 6) and not (have_t and have_l):
        raise ValueError("Intra_4x4 diagonal mode without neighbours")
    if mode == 7 and not have_t:
        raise ValueError("Intra_4x4_VL without top samples")
    if mode == 8 and not have_l:
        raise ValueError("Intra_4x4_HU without left samples")
    if mode > 8:
        raise ValueError(f"bad Intra_4x4 mode {mode}")
    # directional modes 3-8: one gather + filter over the neighbour
    # vector (tables in _pred4_tabs; bit-identical to the per-sample
    # branch logic they were generated from)
    a_idx, b_idx, c_idx, two = _pred4_tabs()[mode]
    mvec = np.empty(13, dtype=np.int64)
    mvec[0] = l[3]
    mvec[1] = l[2]
    mvec[2] = l[1]
    mvec[3] = l[0]
    mvec[4] = tl
    mvec[5:13] = t
    a, b, c = mvec[a_idx], mvec[b_idx], mvec[c_idx]
    return np.where(two, (a + b + 1) >> 1, (a + 2 * b + c + 2) >> 2)


def predict_16x16(mode, t, l, tl, have_t, have_l):
    """8.3.3: full-macroblock luma prediction.  t: 16 top, l: 16 left."""
    np = _np()
    if mode == 0:  # Vertical
        if not have_t:
            raise ValueError("Intra_16x16_Vertical without top")
        return np.tile(t, (16, 1)).astype(np.int64)
    if mode == 1:  # Horizontal
        if not have_l:
            raise ValueError("Intra_16x16_Horizontal without left")
        return np.tile(l.reshape(16, 1), (1, 16)).astype(np.int64)
    if mode == 2:  # DC
        if have_t and have_l:
            v = (int(t.sum()) + int(l.sum()) + 16) >> 5
        elif have_t:
            v = (int(t.sum()) + 8) >> 4
        elif have_l:
            v = (int(l.sum()) + 8) >> 4
        else:
            v = 128
        return np.full((16, 16), v, dtype=np.int64)
    if mode == 3:  # Plane
        if not (have_t and have_l):
            raise ValueError("Intra_16x16_Plane without neighbours")
        hh = sum(
            (x + 1) * (int(t[8 + x]) - int(t[6 - x] if x < 7 else tl))
            for x in range(8)
        )
        vv = sum(
            (y + 1) * (int(l[8 + y]) - int(l[6 - y] if y < 7 else tl))
            for y in range(8)
        )
        a = 16 * (int(l[15]) + int(t[15]))
        b = (5 * hh + 32) >> 6
        c = (5 * vv + 32) >> 6
        ys, xs = np.mgrid[0:16, 0:16]
        return np.clip((a + b * (xs - 7) + c * (ys - 7) + 16) >> 5, 0, 255)
    raise ValueError(f"bad Intra_16x16 mode {mode}")


def predict_chroma(mode, t, l, tl, have_t, have_l):
    """8.3.4: 8x8 chroma prediction (4:2:0).  Chroma mode numbering:
    0 DC, 1 Horizontal, 2 Vertical, 3 Plane."""
    np = _np()
    p = np.zeros((8, 8), dtype=np.int64)
    if mode == 0:  # DC, per 4x4 quadrant (8.3.4.1)
        for qy in (0, 4):
            for qx in (0, 4):
                ts = int(t[qx : qx + 4].sum()) if have_t else 0
                ls = int(l[qy : qy + 4].sum()) if have_l else 0
                if qx == 0 and qy == 0 or (qx == 4 and qy == 4):
                    if have_t and have_l:
                        v = (ts + ls + 4) >> 3
                    elif have_t:
                        v = (ts + 2) >> 2
                    elif have_l:
                        v = (ls + 2) >> 2
                    else:
                        v = 128
                elif qx == 4 and qy == 0:  # prefers top
                    if have_t:
                        v = (ts + 2) >> 2
                    elif have_l:
                        v = (ls + 2) >> 2
                    else:
                        v = 128
                else:  # (0, 4): prefers left
                    if have_l:
                        v = (ls + 2) >> 2
                    elif have_t:
                        v = (ts + 2) >> 2
                    else:
                        v = 128
                p[qy : qy + 4, qx : qx + 4] = v
        return p
    if mode == 1:  # Horizontal
        if not have_l:
            raise ValueError("Intra_Chroma_Horizontal without left")
        return np.tile(l.reshape(8, 1), (1, 8)).astype(np.int64)
    if mode == 2:  # Vertical
        if not have_t:
            raise ValueError("Intra_Chroma_Vertical without top")
        return np.tile(t, (8, 1)).astype(np.int64)
    if mode == 3:  # Plane
        if not (have_t and have_l):
            raise ValueError("Intra_Chroma_Plane without neighbours")
        hh = sum(
            (x + 1) * (int(t[4 + x]) - int(t[2 - x] if x < 3 else tl))
            for x in range(4)
        )
        vv = sum(
            (y + 1) * (int(l[4 + y]) - int(l[2 - y] if y < 3 else tl))
            for y in range(4)
        )
        a = 16 * (int(l[7]) + int(t[7]))
        b = (17 * hh + 16) >> 5
        c = (17 * vv + 16) >> 5
        ys, xs = np.mgrid[0:8, 0:8]
        return np.clip((a + b * (xs - 3) + c * (ys - 3) + 16) >> 5, 0, 255)
    raise ValueError(f"bad chroma pred mode {mode}")


# ---------------------------------------------------------------------------
# Macroblock / slice layer (7.3.5, 8.3, 8.5)
# ---------------------------------------------------------------------------
#: luma4x4BlkIdx (Z order: Z within each 8x8 quadrant, quadrants in Z
#: order — spec 6.4.3 inverse 4x4 luma block scan) → (bx, by) in 4x4
#: block units within the macroblock
def _blk_xy(blk: int) -> tuple[int, int]:
    q, b = blk >> 2, blk & 3
    return (q & 1) * 2 + (b & 1), (q >> 1) * 2 + (b >> 1)


def _nc_from_grid(grid, gx: int, gy: int) -> int:
    """9.2.1 nC: mean of left/above neighbour TotalCoeff (grid holds
    one entry per 4x4 block of the whole picture; out-of-bounds =
    unavailable).  Raster MB order + Z block order guarantee any
    in-bounds left/above block is already decoded."""
    a = int(grid[gy, gx - 1]) if gx > 0 else -1
    b = int(grid[gy - 1, gx]) if gy > 0 else -1
    if a >= 0 and b >= 0:
        return (a + b + 1) >> 1
    if a >= 0:
        return a
    if b >= 0:
        return b
    return 0


def _pred_mode_4x4(mode4, gx: int, gy: int) -> int:
    """8.3.1.1 predIntra4x4PredMode = Min(modeA, modeB); an
    unavailable neighbour counts as 2 (DC).  mode4 holds 2 for blocks
    of non-I_4x4 macroblocks (the spec's inference), so only picture
    bounds need checking here."""
    a = int(mode4[gy, gx - 1]) if gx > 0 else 2
    b = int(mode4[gy - 1, gx]) if gy > 0 else 2
    return min(a, b)


def _gather4(y, dec4, px: int, py: int, width: int):
    """Neighbour samples for one 4x4 luma prediction (8.3.1.2):
    t[0:8] top incl. top-right (t[4:8] substituted with t[3] when the
    top-right block is outside the picture or not yet decoded), l[0:4]
    left, tl corner."""
    np = _np()
    have_t, have_l = py > 0, px > 0
    t = np.zeros(8, dtype=np.int64)
    l = np.zeros(4, dtype=np.int64)
    tl = 0
    have_tr = False
    if have_t:
        t[:4] = y[py - 1, px : px + 4]
        trx = px + 4
        have_tr = trx < width and bool(dec4[(py - 1) >> 2, trx >> 2])
        if have_tr:
            t[4:8] = y[py - 1, trx : trx + 4]
        else:
            t[4:8] = t[3]
    if have_l:
        l[:] = y[py : py + 4, px - 1]
    if have_t and have_l:
        tl = int(y[py - 1, px - 1])
    return t, l, tl, have_t, have_l, have_tr


def chroma_qp(qp_y: int, offset: int) -> int:
    """Table 8-15 QPc from QPy + chroma_qp_index_offset."""
    return QPC_TABLE[min(51, max(0, qp_y + offset))]


def _recon_luma16_dc_ac(pred, dc_levels, ac_blocks, qp):
    """Shared I_16x16 luma reconstruction: Hadamard-dequantised DC +
    per-4x4 AC, returns the clipped 16x16 block (8.5.10 + 8.5.12)."""
    np = _np()
    dc_y = dequant_luma_dc(dc_levels, qp)
    levels = [[0] + list(ac_blocks[blk]) for blk in range(16)]
    d = dequant_4x4_batch(levels, qp, skip_dc=True)
    z2r, _ = _blk_z2r()
    d[:, 0, 0] = dc_y.reshape(16)[z2r]
    res = inverse_transform_4x4_batch(d)
    return blocks_to_mb(
        np.minimum(np.maximum(mb_to_blocks(np.asarray(pred)) + res, 0), 255)
    )


def _recon_chroma(pred, dc_levels4, ac_blocks, qpc):
    """Shared 8x8 chroma reconstruction for one component: 2x2
    Hadamard DC + per-4x4 AC (8.5.11 + 8.5.12)."""
    np = _np()
    dc = dequant_chroma_dc(dc_levels4, qpc)
    levels = [[0] + list(ac_blocks[blk]) for blk in range(4)]
    d = dequant_4x4_batch(levels, qpc, skip_dc=True)
    d[:, 0, 0] = dc.reshape(4)  # blk = (blk>>1, blk&1) raster order
    res = inverse_transform_4x4_batch(d)
    # chroma blocks are raster-ordered 2x2 within the 8x8 component
    pb = np.asarray(pred).reshape(2, 4, 2, 4).transpose(0, 2, 1, 3)
    out = np.minimum(np.maximum(pb.reshape(4, 4, 4) + res, 0), 255)
    return out.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8)


class _SliceState:
    """Per-slice decoder state: reconstruction planes plus the
    neighbour-context grids (TotalCoeff for nC, Intra_4x4 pred modes,
    4x4-block decoded flags, per-MB motion vectors) and the running
    QP."""

    def __init__(self, sps: dict, pps: dict, qp: int):
        np = _np()
        self.mbw = sps["pic_width_in_mbs"]
        self.mbh = sps["pic_height_in_map_units"]
        h, w = self.mbh * 16, self.mbw * 16
        self.y = np.zeros((h, w), dtype=np.int64)
        self.cb = np.zeros((h // 2, w // 2), dtype=np.int64)
        self.cr = np.zeros((h // 2, w // 2), dtype=np.int64)
        self.tc_y = np.zeros((self.mbh * 4, self.mbw * 4), dtype=np.int64)
        self.tc_c = [
            np.zeros((self.mbh * 2, self.mbw * 2), dtype=np.int64)
            for _ in range(2)
        ]
        #: Intra_4x4 pred modes; 2 (DC) for non-I_4x4 MBs is exactly
        #: the spec's neighbour inference (8.3.1.1)
        self.mode4 = np.full((self.mbh * 4, self.mbw * 4), 2, np.int64)
        self.dec4 = np.zeros((self.mbh * 4, self.mbw * 4), dtype=bool)
        #: 4x4-granularity motion state (8.4.1.3 contexts + §8.7 bS);
        #: mvf covers list 0, mvf1 list 1 (B slices) — a block that
        #: does not predict from a list is marked INTRA there ("does
        #: not use this list": contributes (0,0) to medians and never
        #: satisfies a same-reference test, exactly 8.4.1.3's rule)
        from .h264_inter import MvField

        self.mvf = MvField(self.mbw, self.mbh)
        self.mvf1 = MvField(self.mbw, self.mbh)
        #: per-MB luma QP at decode time + intra flags — exactly the
        #: §8.7 deblocking inputs (I_PCM records QP 0 per the spec)
        self.qp_mb = np.zeros((self.mbh, self.mbw), dtype=np.int64)
        self.intra_mb = np.zeros((self.mbh, self.mbw), dtype=bool)
        self.qp = qp
        self.cq_off = pps.get("chroma_qp_index_offset", 0)
        #: explicit weighted-prediction table (8.4.2.3) or None
        self.wp: dict | None = None
        #: SPS direct_8x8_inference_flag (spatial direct colocated
        #: motion sampled per 8x8 quadrant corner vs per 4x4)
        self.inference8x8 = bool(sps.get("direct_8x8_inference", 1))
        #: direct-mode selection + POC triple (B slices; 8.4.1.2)
        self.direct_temporal = False
        self.pocs = None
        #: active list-0 references (P slices; te(v) ref_idx when > 1)
        self.n_ref0 = 1

    def planes_u8(self):
        np = _np()
        return (
            self.y.astype(np.uint8),
            self.cb.astype(np.uint8),
            self.cr.astype(np.uint8),
        )


def _bump(counts, key):
    if counts is not None:
        counts[key] = counts.get(key, 0) + 1


def _decode_intra_mb(r, st, mx: int, my: int, mb_type: int, counts):
    """One intra macroblock (I_PCM / I_4x4 / I_16x16) — shared by I
    slices and intra MBs inside P slices (mb_type offset 5 already
    removed by the caller)."""
    np = _np()
    y, cb, cr = st.y, st.cb, st.cr
    w = st.mbw * 16
    st.intra_mb[my, mx] = True
    st.mvf.put_intra(my * 4, mx * 4, 4, 4)
    st.mvf1.put_intra(my * 4, mx * 4, 4, 4)
    if mb_type == 25:  # I_PCM — raw samples; slice QP carries over
        _bump(counts, "ipcm")
        # deblocking sees I_PCM at QPY 0 (§8.7) — filter-neutral edges
        st.qp_mb[my, mx] = 0
        r.byte_align()
        yb = np.frombuffer(r.bytes_at(256), dtype=np.uint8)
        y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = yb.reshape(
            16, 16
        )
        cbb = np.frombuffer(r.bytes_at(64), dtype=np.uint8)
        crb = np.frombuffer(r.bytes_at(64), dtype=np.uint8)
        cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = cbb.reshape(8, 8)
        cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = crb.reshape(8, 8)
        st.tc_y[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 16
        for c in range(2):
            st.tc_c[c][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
        st.dec4[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = True
        return
    if mb_type > 25:
        raise ValueError(f"invalid intra mb_type {mb_type}")

    if mb_type == 0:  # I_4x4 (I_NxN; baseline has no 8x8 transform)
        _bump(counts, "i4")
        modes = []
        for blk in range(16):
            bx, by = _blk_xy(blk)
            gx, gy = mx * 4 + bx, my * 4 + by
            pm = _pred_mode_4x4(st.mode4, gx, gy)
            if r.u(1):  # prev_intra4x4_pred_mode_flag
                mode = pm
            else:
                rem = r.u(3)
                mode = rem if rem < pm else rem + 1
            st.mode4[gy, gx] = mode
            modes.append(mode)
        chroma_mode = r.ue()
        cbp_code = r.ue()
        if cbp_code >= len(CBP_INTRA_FROM_CODENUM):
            raise ValueError("invalid coded_block_pattern code")
        cbp = CBP_INTRA_FROM_CODENUM[cbp_code]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            st.qp = (st.qp + r.se() + 52) % 52
        lv_luma = [[0] * 16 for _ in range(16)]
        for blk in range(16):
            bx, by = _blk_xy(blk)
            gx, gy = mx * 4 + bx, my * 4 + by
            if cbp_luma & (1 << (blk >> 2)):
                n_c = _nc_from_grid(st.tc_y, gx, gy)
                lv_luma[blk], tc = decode_residual_block(r, n_c, 16)
                st.tc_y[gy, gx] = tc
            else:
                st.tc_y[gy, gx] = 0
        dc_c, ac_c = _read_chroma_residual(
            r, st.tc_c, mx, my, cbp_chroma
        )
        # reconstruct luma sequentially (later blocks predict from
        # earlier reconstructions)
        for blk in range(16):
            bx, by = _blk_xy(blk)
            gx, gy = mx * 4 + bx, my * 4 + by
            px, py = mx * 16 + bx * 4, my * 16 + by * 4
            t, l, tl, have_t, have_l, have_tr = _gather4(
                y, st.dec4, px, py, w
            )
            pred = predict_4x4(
                modes[blk], t, l, tl, have_t, have_l, have_tr
            )
            if cbp_luma & (1 << (blk >> 2)):
                res = inverse_transform_4x4(
                    dequant_4x4(lv_luma[blk], st.qp)
                )
            else:
                res = 0
            y[py : py + 4, px : px + 4] = np.clip(pred + res, 0, 255)
            st.dec4[gy, gx] = True
    else:  # I_16x16: prediction mode and CBP from mb_type (7.4.5)
        _bump(counts, "i16")
        k = mb_type - 1
        pm16 = k % 4
        luma_flag = k >= 12
        cbp_chroma = (k - (12 if luma_flag else 0)) // 4
        chroma_mode = r.ue()
        st.qp = (st.qp + r.se() + 52) % 52  # mb_qp_delta always coded
        gx0, gy0 = mx * 4, my * 4
        n_c = _nc_from_grid(st.tc_y, gx0, gy0)
        dc_levels, _dc_tc = decode_residual_block(r, n_c, 16)
        ac_blocks = [[0] * 15 for _ in range(16)]
        for blk in range(16):
            bx, by = _blk_xy(blk)
            gx, gy = mx * 4 + bx, my * 4 + by
            if luma_flag:
                n_c = _nc_from_grid(st.tc_y, gx, gy)
                ac_blocks[blk], tc = decode_residual_block(r, n_c, 15)
                st.tc_y[gy, gx] = tc
            else:
                st.tc_y[gy, gx] = 0
        dc_c, ac_c = _read_chroma_residual(
            r, st.tc_c, mx, my, cbp_chroma
        )
        px, py = mx * 16, my * 16
        have_t, have_l = my > 0, mx > 0
        t = y[py - 1, px : px + 16] if have_t else np.zeros(16, np.int64)
        l = y[py : py + 16, px - 1] if have_l else np.zeros(16, np.int64)
        tl = int(y[py - 1, px - 1]) if have_t and have_l else 0
        pred = predict_16x16(pm16, t, l, tl, have_t, have_l)
        y[py : py + 16, px : px + 16] = _recon_luma16_dc_ac(
            pred, dc_levels, ac_blocks, st.qp
        )
        st.dec4[gy0 : gy0 + 4, gx0 : gx0 + 4] = True

    # intra chroma reconstruction (shared by I_4x4 and I_16x16)
    st.qp_mb[my, mx] = st.qp
    qpc = chroma_qp(st.qp, st.cq_off)
    cx, cy = mx * 8, my * 8
    have_t, have_l = my > 0, mx > 0
    for c, plane in ((0, cb), (1, cr)):
        t = (
            plane[cy - 1, cx : cx + 8]
            if have_t
            else np.zeros(8, np.int64)
        )
        l = (
            plane[cy : cy + 8, cx - 1]
            if have_l
            else np.zeros(8, np.int64)
        )
        tl = int(plane[cy - 1, cx - 1]) if have_t and have_l else 0
        pred = predict_chroma(chroma_mode, t, l, tl, have_t, have_l)
        if cbp_chroma:
            rec = _recon_chroma(pred, dc_c[c], ac_c[c], qpc)
        else:
            rec = np.clip(pred, 0, 255)
        plane[cy : cy + 8, cx : cx + 8] = rec


def _recon_inter_mb(st, mx: int, my: int, pred, pred_cb, pred_cr,
                    lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma):
    """Reconstruct one inter macroblock from its (already
    motion-compensated, partition-assembled) 16x16 luma + 8x8 chroma
    predictions and the shared CAVLC residual.  Explicit weighted
    prediction (st.wp, 8.4.2.3) applies here — the single funnel all
    P shapes (16x16 / partitions / P_8x8 / P_Skip) route through, and
    with one reference the per-partition weights are identical, so
    weighting the assembled macroblock equals weighting each
    partition."""
    np = _np()

    if st.wp is not None:
        from .h264_inter import wp_apply

        w = st.wp
        pred = wp_apply(pred, w["wl"], w["ol"], w["lwd"])
        pred_cb = wp_apply(pred_cb, w["wcb"], w["ocb"], w["cwd"])
        pred_cr = wp_apply(pred_cr, w["wcr"], w["ocr"], w["cwd"])
    from .h264_inter import _recon_luma_mb

    px, py = mx * 16, my * 16
    st.y[py : py + 16, px : px + 16] = _recon_luma_mb(
        pred, lv_luma, cbp_luma, st.qp
    )
    qpc = chroma_qp(st.qp, st.cq_off)
    cx, cy = mx * 8, my * 8
    for c, (plane, predc) in ((0, (st.cb, pred_cb)), (1, (st.cr, pred_cr))):
        if cbp_chroma:
            rec = _recon_chroma(predc, dc_c[c], ac_c[c], qpc)
        else:
            rec = np.clip(predc, 0, 255)
        plane[cy : cy + 8, cx : cx + 8] = rec
    st.dec4[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = True
    st.qp_mb[my, mx] = st.qp


def _read_inter_residual(r, st, mx: int, my: int):
    """CBP + optional mb_qp_delta + luma/chroma CAVLC residual —
    identical syntax for every inter macroblock shape (7.3.5)."""
    from .h264_inter import CBP_INTER_FROM_CODENUM

    cbp_code = r.ue()
    if cbp_code >= len(CBP_INTER_FROM_CODENUM):
        raise ValueError("invalid coded_block_pattern code")
    cbp = CBP_INTER_FROM_CODENUM[cbp_code]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp:
        st.qp = (st.qp + r.se() + 52) % 52
    lv_luma = [[0] * 16 for _ in range(16)]
    for blk in range(16):
        bx, by = _blk_xy(blk)
        gx, gy = mx * 4 + bx, my * 4 + by
        if cbp_luma & (1 << (blk >> 2)):
            n_c = _nc_from_grid(st.tc_y, gx, gy)
            lv_luma[blk], tc = decode_residual_block(r, n_c, 16)
            st.tc_y[gy, gx] = tc
        else:
            st.tc_y[gy, gx] = 0
    dc_c, ac_c = _read_chroma_residual(r, st.tc_c, mx, my, cbp_chroma)
    return lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma



def _te(r, cmax: int) -> int:
    """Truncated exp-Golomb (9.1.1): single inverted bit when the
    range is [0, 1], plain ue(v) otherwise."""
    if cmax <= 0:
        return 0
    if cmax == 1:
        return 1 - r.u(1)
    v = r.ue()
    if v > cmax:
        raise ValueError(f"ref_idx {v} exceeds active references")
    return v


def _decode_p16_mb(r, st, mx: int, my: int, refs0, counts):
    """Parse + reconstruct one P_L0_16x16 macroblock: ref_idx_l0
    te(v) when more than one reference is active (absent otherwise),
    mvd with the refIdx-aware 8.4.1.3 predictor, CBP via the Table
    9-4 Inter mapping, then the shared CAVLC residual."""
    from .h264_inter import mc_chroma, mc_luma, predict_mv_part

    _bump(counts, "p16")
    ridx = _te(r, st.n_ref0 - 1)
    mvp = predict_mv_part(st.mvf, mx * 4, my * 4, 4, ref_idx=ridx)
    mv = (mvp[0] + r.se(), mvp[1] + r.se())
    st.mvf.put_inter(my * 4, mx * 4, 4, 4, mv, ref_idx=ridx)
    lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma = _read_inter_residual(
        r, st, mx, my
    )
    ry, rcb, rcr = refs0[ridx]
    px, py = mx * 16, my * 16
    _recon_inter_mb(
        st, mx, my,
        mc_luma(ry, px, py, mv[0], mv[1]),
        mc_chroma(rcb, mx * 8, my * 8, mv[0], mv[1]),
        mc_chroma(rcr, mx * 8, my * 8, mv[0], mv[1]),
        lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma,
    )


def _decode_p_part_mb(r, st, mx: int, my: int, refs0, mb_type: int,
                      counts):
    """Parse + reconstruct one partitioned inter macroblock —
    P_L0_L0_16x8 (mb_type 1) or P_L0_L0_8x16 (mb_type 2).  Syntax
    order per 7.3.5.1: both ref_idx_l0 te(v) codes (when more than
    one reference is active), then both mvds; each partition's
    predictor derived sequentially per 8.4.1.3 (partition 1 sees
    partition 0's decided MV and reference), then the shared residual
    and a partition-assembled reconstruction."""
    import numpy as np

    from .h264_inter import mc_chroma, mc_luma, predict_mv_part

    _bump(counts, "p16x8" if mb_type == 1 else "p8x16")
    ridxs = [_te(r, st.n_ref0 - 1), _te(r, st.n_ref0 - 1)]
    mvds = [(r.se(), r.se()), (r.se(), r.se())]
    gx0, gy0 = mx * 4, my * 4
    pred = np.zeros((16, 16), dtype=np.int64)
    pred_cb = np.zeros((8, 8), dtype=np.int64)
    pred_cr = np.zeros((8, 8), dtype=np.int64)
    if mb_type == 1:  # 16x8: top then bottom
        parts = (
            (gx0, gy0, 4, 2, "B"),
            (gx0, gy0 + 2, 4, 2, "A"),
        )
    else:  # 8x16: left then right
        parts = (
            (gx0, gy0, 2, 4, "A"),
            (gx0 + 2, gy0, 2, 4, "C"),
        )
    for (gx, gy, w4, h4, direction), mvd, ridx in zip(
        parts, mvds, ridxs
    ):
        ry, rcb, rcr = refs0[ridx]
        mvp = predict_mv_part(st.mvf, gx, gy, w4, direction,
                              ref_idx=ridx)
        mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        st.mvf.put_inter(gy, gx, h4, w4, mv, ref_idx=ridx)
        px, py = gx * 4, gy * 4
        lx, ly = px - mx * 16, py - my * 16
        bw, bh = w4 * 4, h4 * 4
        pred[ly : ly + bh, lx : lx + bw] = mc_luma(
            ry, px, py, mv[0], mv[1], bh=bh, bw=bw
        )
        pred_cb[ly // 2 : ly // 2 + bh // 2,
                lx // 2 : lx // 2 + bw // 2] = mc_chroma(
            rcb, px // 2, py // 2, mv[0], mv[1], bh=bh // 2, bw=bw // 2
        )
        pred_cr[ly // 2 : ly // 2 + bh // 2,
                lx // 2 : lx // 2 + bw // 2] = mc_chroma(
            rcr, px // 2, py // 2, mv[0], mv[1], bh=bh // 2, bw=bw // 2
        )
    lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma = _read_inter_residual(
        r, st, mx, my
    )
    _recon_inter_mb(
        st, mx, my, pred, pred_cb, pred_cr,
        lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma,
    )


#: sub_mb_type (Table 7-17, P slices) → (sub-partition width4, height4)
_SUB_SHAPES = {0: (2, 2), 1: (2, 1), 2: (1, 2), 3: (1, 1)}


def _decode_p8x8_mb(r, st, mx: int, my: int, refs0, counts,
                    mb_type: int = 3):
    """Parse + reconstruct one P_8x8 / P_8x8ref0 macroblock: four
    sub_mb_type codes (Table 7-17: 8x8, 8x4, 4x8, 4x4), then — for
    P_8x8 with more than one active reference — a ref_idx_l0 te(v)
    per 8x8 quadrant (P_8x8ref0, mb_type 4, pins every quadrant to
    reference 0), then all mvd pairs in sub-partition raster order
    (7.3.5.2), each sub-partition predicted by the 8.4.1.3.1 median
    process at its own block geometry (no directional rules below
    the macroblock level), then the shared residual."""
    import numpy as np

    from .h264_inter import mc_chroma, mc_luma, predict_mv_part

    _bump(counts, "p8x8")
    subs = []
    for _ in range(4):
        smt = r.ue()
        if smt > 3:
            raise ValueError(f"invalid P sub_mb_type {smt}")
        subs.append(smt)
    if mb_type == 3 and st.n_ref0 > 1:
        ridxs = [_te(r, st.n_ref0 - 1) for _ in range(4)]
    else:
        ridxs = [0, 0, 0, 0]
    gx0, gy0 = mx * 4, my * 4
    pred = np.zeros((16, 16), dtype=np.int64)
    pred_cb = np.zeros((8, 8), dtype=np.int64)
    pred_cr = np.zeros((8, 8), dtype=np.int64)
    for part in range(4):
        qx, qy = gx0 + (part & 1) * 2, gy0 + (part >> 1) * 2
        w4, h4 = _SUB_SHAPES[subs[part]]
        ridx = ridxs[part]
        ry, rcb, rcr = refs0[ridx]
        for sy in range(0, 2, h4):
            for sx in range(0, 2, w4):
                gx, gy = qx + sx, qy + sy
                mvp = predict_mv_part(st.mvf, gx, gy, w4,
                                      ref_idx=ridx)
                mv = (mvp[0] + r.se(), mvp[1] + r.se())
                st.mvf.put_inter(gy, gx, h4, w4, mv, ref_idx=ridx)
                px, py = gx * 4, gy * 4
                lx, ly = px - mx * 16, py - my * 16
                bw, bh = w4 * 4, h4 * 4
                pred[ly : ly + bh, lx : lx + bw] = mc_luma(
                    ry, px, py, mv[0], mv[1], bh=bh, bw=bw
                )
                pred_cb[
                    ly // 2 : ly // 2 + bh // 2,
                    lx // 2 : lx // 2 + bw // 2,
                ] = mc_chroma(
                    rcb, px // 2, py // 2, mv[0], mv[1],
                    bh=bh // 2, bw=bw // 2,
                )
                pred_cr[
                    ly // 2 : ly // 2 + bh // 2,
                    lx // 2 : lx // 2 + bw // 2,
                ] = mc_chroma(
                    rcr, px // 2, py // 2, mv[0], mv[1],
                    bh=bh // 2, bw=bw // 2,
                )
    lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma = _read_inter_residual(
        r, st, mx, my
    )
    _recon_inter_mb(
        st, mx, my, pred, pred_cb, pred_cr,
        lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma,
    )


def _recon_pskip(st, mx: int, my: int, refs0, counts):
    """P_Skip: motion-compensated copy at the skip-predicted MV on
    reference 0, no residual, no TotalCoeff contribution (8.4.1.1)."""
    from .h264_inter import mc_chroma, mc_luma, skip_mv

    _bump(counts, "pskip")
    mv = skip_mv(st.mvf, mx, my)
    st.mvf.put_inter(my * 4, mx * 4, 4, 4, mv, ref_idx=0)
    st.tc_y[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 0
    for c in range(2):
        st.tc_c[c][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0
    ry, rcb, rcr = refs0[0]
    px, py = mx * 16, my * 16
    _recon_inter_mb(
        st, mx, my,
        mc_luma(ry, px, py, mv[0], mv[1]),
        mc_chroma(rcb, mx * 8, my * 8, mv[0], mv[1]),
        mc_chroma(rcr, mx * 8, my * 8, mv[0], mv[1]),
        None, 0, None, None, 0,
    )


def _b_pred_16x16(mx: int, my: int, ref0, ref1, mv0, mv1):
    """Assemble the 16x16 luma + 8x8 chroma prediction of a B
    macroblock from per-list MVs (either may be None = list unused);
    both present → default bi-prediction average (8.4.2.3.1)."""
    from .h264_inter import bi_average, mc_chroma, mc_luma

    px, py = mx * 16, my * 16
    cx, cy = mx * 8, my * 8
    parts = []
    for mv, ref in ((mv0, ref0), (mv1, ref1)):
        if mv is None:
            continue
        parts.append((
            mc_luma(ref[0], px, py, mv[0], mv[1]),
            mc_chroma(ref[1], cx, cy, mv[0], mv[1]),
            mc_chroma(ref[2], cx, cy, mv[0], mv[1]),
        ))
    if len(parts) == 2:
        return tuple(
            bi_average(a, b) for a, b in zip(parts[0], parts[1])
        )
    return parts[0]


def _derive_direct(f0, f1, col, inference8x8: bool, mx: int, my: int,
                   temporal: bool = False, pocs=None):
    """Direct-mode motion derivation: spatial (8.4.1.2.2, the
    default) or temporal (8.4.1.2.3, POC-scaled colocated motion)
    per the slice header's direct_spatial_mv_pred_flag."""
    from .h264_inter import spatial_direct, temporal_direct

    if temporal:
        return temporal_direct(col, pocs, mx, my, inference8x8)
    return spatial_direct(f0, f1, col, mx, my, inference8x8)


def _b_direct_predict(f0, f1, col, inference8x8: bool,
                      mx: int, my: int, ref0, ref1,
                      temporal: bool = False, pocs=None):
    """Direct-mode derivation + motion compensation WITHOUT state
    commitment (shared by the decoder and the encoder twin's RD
    probes).  Returns (use0, use1, mv0s, mv1s, (y, cb, cr) pred)."""
    import numpy as np

    from .h264_inter import bi_average, mc_chroma, mc_luma

    use0, use1, mv0s, mv1s = _derive_direct(
        f0, f1, col, inference8x8, mx, my, temporal, pocs
    )
    uniform0 = all(mv == mv0s[0][0] for row in mv0s for mv in row)
    uniform1 = all(mv == mv1s[0][0] for row in mv1s for mv in row)
    if uniform0 and uniform1:
        pred = _b_pred_16x16(
            mx, my, ref0, ref1,
            mv0s[0][0] if use0 else None,
            mv1s[0][0] if use1 else None,
        )
    else:
        # colZeroFlag varies inside the MB: compensate per 4x4 luma /
        # 2x2 chroma block with that block's derived MVs
        py_ = np.zeros((16, 16), dtype=np.int64)
        pcb = np.zeros((8, 8), dtype=np.int64)
        pcr = np.zeros((8, 8), dtype=np.int64)
        for by in range(4):
            for bx in range(4):
                lx, ly = bx * 4, by * 4
                px, py0 = mx * 16 + lx, my * 16 + ly
                cxx, cyy = mx * 8 + lx // 2, my * 8 + ly // 2
                blocks = []
                for use, mvs, ref in (
                    (use0, mv0s, ref0), (use1, mv1s, ref1)
                ):
                    if not use:
                        continue
                    mv = mvs[by][bx]
                    blocks.append((
                        mc_luma(ref[0], px, py0, mv[0], mv[1],
                                bh=4, bw=4),
                        mc_chroma(ref[1], cxx, cyy, mv[0], mv[1],
                                  bh=2, bw=2),
                        mc_chroma(ref[2], cxx, cyy, mv[0], mv[1],
                                  bh=2, bw=2),
                    ))
                if len(blocks) == 2:
                    blk = tuple(
                        bi_average(a, b)
                        for a, b in zip(blocks[0], blocks[1])
                    )
                else:
                    blk = blocks[0]
                py_[ly : ly + 4, lx : lx + 4] = blk[0]
                pcb[ly // 2 : ly // 2 + 2, lx // 2 : lx // 2 + 2] = blk[1]
                pcr[ly // 2 : ly // 2 + 2, lx // 2 : lx // 2 + 2] = blk[2]
        pred = (py_, pcb, pcr)
    return use0, use1, mv0s, mv1s, pred


def _commit_b_motion(f0, f1, mx: int, my: int,
                     use0, use1, mv0s, mv1s) -> None:
    """Write a B macroblock's per-list 4x4 motion into the slice (or
    encoder) motion fields — an unused list is marked 'decoded, not
    using this list' (put_intra) so later medians treat it right."""
    gx, gy = mx * 4, my * 4
    for by in range(4):
        for bx in range(4):
            if use0:
                f0.put_inter(gy + by, gx + bx, 1, 1, mv0s[by][bx])
            else:
                f0.put_intra(gy + by, gx + bx, 1, 1)
            if use1:
                f1.put_inter(gy + by, gx + bx, 1, 1, mv1s[by][bx])
            else:
                f1.put_intra(gy + by, gx + bx, 1, 1)


def _b_direct_pred(st, mx: int, my: int, refs):
    """Spatial-direct prediction for one B macroblock (B_Skip /
    B_Direct_16x16): derive, motion-compensate, commit motion state.
    Returns the (pred_y, pred_cb, pred_cr) triple."""
    ref0, ref1, col = refs
    use0, use1, mv0s, mv1s, pred = _b_direct_predict(
        st.mvf, st.mvf1, col, st.inference8x8, mx, my, ref0, ref1,
        st.direct_temporal, st.pocs,
    )
    _commit_b_motion(st.mvf, st.mvf1, mx, my, use0, use1, mv0s, mv1s)
    return pred


def _recon_bskip(st, mx: int, my: int, refs, counts):
    """B_Skip: spatial-direct prediction, no residual (8.4.1.2)."""
    _bump(counts, "bskip")
    pred_y, pred_cb, pred_cr = _b_direct_pred(st, mx, my, refs)
    st.tc_y[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 0
    for c in range(2):
        st.tc_c[c][my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 0
    _recon_inter_mb(
        st, mx, my, pred_y, pred_cb, pred_cr, None, 0, None, None, 0
    )


def _decode_b_mb(r, st, mx: int, my: int, refs, mb_type: int, counts):
    """Parse + reconstruct one 16x16-partition B macroblock:
    B_Direct_16x16 (mb_type 0, spatial direct + residual) or
    B_L0/L1/Bi_16x16 (1/2/3: per-list median MV prediction + mvd,
    list-0 mvd first for Bi per 7.3.5.1, default bi-prediction
    average).  Single active reference per list, so no ref_idx
    syntax; residual is the shared inter CBP + CAVLC layer."""
    ref0, ref1, _col = refs
    if mb_type == 0:
        _bump(counts, "bdirect")
        pred_y, pred_cb, pred_cr = _b_direct_pred(st, mx, my, refs)
    else:
        from .h264_inter import predict_mv

        _bump(counts, "bbi" if mb_type == 3 else "b16")
        use0 = mb_type in (1, 3)
        use1 = mb_type in (2, 3)
        mv0 = mv1 = None
        if use0:
            mvp = predict_mv(st.mvf, mx, my)
            mv0 = (mvp[0] + r.se(), mvp[1] + r.se())
        if use1:
            mvp = predict_mv(st.mvf1, mx, my)
            mv1 = (mvp[0] + r.se(), mvp[1] + r.se())
        if use0:
            st.mvf.put_inter(my * 4, mx * 4, 4, 4, mv0)
        else:
            st.mvf.put_intra(my * 4, mx * 4, 4, 4)
        if use1:
            st.mvf1.put_inter(my * 4, mx * 4, 4, 4, mv1)
        else:
            st.mvf1.put_intra(my * 4, mx * 4, 4, 4)
        pred_y, pred_cb, pred_cr = _b_pred_16x16(
            mx, my, ref0, ref1, mv0, mv1
        )
    lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma = _read_inter_residual(
        r, st, mx, my
    )
    _recon_inter_mb(
        st, mx, my, pred_y, pred_cb, pred_cr,
        lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma,
    )


#: Table 7-14 two-partition B macroblocks: mb_type → (pred mode of
#: partition 0, of partition 1, geometry: 1 = 16x8, 2 = 8x16)
_B_PART_MODES = {
    4: ("L0", "L0", 1), 5: ("L0", "L0", 2),
    6: ("L1", "L1", 1), 7: ("L1", "L1", 2),
    8: ("L0", "L1", 1), 9: ("L0", "L1", 2),
    10: ("L1", "L0", 1), 11: ("L1", "L0", 2),
    12: ("L0", "Bi", 1), 13: ("L0", "Bi", 2),
    14: ("L1", "Bi", 1), 15: ("L1", "Bi", 2),
    16: ("Bi", "L0", 1), 17: ("Bi", "L0", 2),
    18: ("Bi", "L1", 1), 19: ("Bi", "L1", 2),
    20: ("Bi", "Bi", 1), 21: ("Bi", "Bi", 2),
}

#: Table 7-18 B sub_mb_type → (pred mode, sub-partition width4, height4)
_B_SUB_MODES = {
    0: ("direct", 2, 2),
    1: ("L0", 2, 2), 2: ("L1", 2, 2), 3: ("Bi", 2, 2),
    4: ("L0", 2, 1), 5: ("L0", 1, 2),
    6: ("L1", 2, 1), 7: ("L1", 1, 2),
    8: ("Bi", 2, 1), 9: ("Bi", 1, 2),
    10: ("L0", 1, 1), 11: ("L1", 1, 1), 12: ("Bi", 1, 1),
}


def _b_paint_part(pred, refs2, gx, gy, w4, h4, mx, my, mv0, mv1):
    """Motion-compensate one B partition at arbitrary geometry from
    either or both lists (bi → default average) and paste it into
    the macroblock-local prediction planes."""
    from .h264_inter import bi_average, mc_chroma, mc_luma

    ref0, ref1 = refs2
    px, py = gx * 4, gy * 4
    lx, ly = px - mx * 16, py - my * 16
    bw, bh = w4 * 4, h4 * 4
    parts = []
    for mv, ref in ((mv0, ref0), (mv1, ref1)):
        if mv is None:
            continue
        parts.append((
            mc_luma(ref[0], px, py, mv[0], mv[1], bh=bh, bw=bw),
            mc_chroma(ref[1], px // 2, py // 2, mv[0], mv[1],
                      bh=bh // 2, bw=bw // 2),
            mc_chroma(ref[2], px // 2, py // 2, mv[0], mv[1],
                      bh=bh // 2, bw=bw // 2),
        ))
    if len(parts) == 2:
        blk = tuple(bi_average(a, b) for a, b in zip(parts[0], parts[1]))
    else:
        blk = parts[0]
    pred[0][ly : ly + bh, lx : lx + bw] = blk[0]
    pred[1][ly // 2 : ly // 2 + bh // 2,
            lx // 2 : lx // 2 + bw // 2] = blk[1]
    pred[2][ly // 2 : ly // 2 + bh // 2,
            lx // 2 : lx // 2 + bw // 2] = blk[2]


def _decode_b_part_mb(r, st, mx: int, my: int, refs, mb_type: int,
                      counts):
    """Parse + reconstruct one two-partition B macroblock (Table 7-14
    mb_type 4..21: 16x8 / 8x16 with every L0/L1/Bi combination).
    Parse order per 7.3.5.1: all mvd_l0 pairs (partition order) first,
    then all mvd_l1 pairs; derivation is partition-sequential per list
    with the 8.4.1.3 directional rules at this geometry."""
    import numpy as np

    from .h264_inter import predict_mv_part

    ref0, ref1, _col = refs
    m0, m1, geo = _B_PART_MODES[mb_type]
    modes = (m0, m1)
    _bump(counts, "bpart")
    gx0, gy0 = mx * 4, my * 4
    if geo == 1:  # 16x8: top then bottom
        parts = ((gx0, gy0, 4, 2, "B"), (gx0, gy0 + 2, 4, 2, "A"))
    else:  # 8x16: left then right
        parts = ((gx0, gy0, 2, 4, "A"), (gx0 + 2, gy0, 2, 4, "C"))
    mvd0 = {
        i: (r.se(), r.se())
        for i in range(2) if modes[i] in ("L0", "Bi")
    }
    mvd1 = {
        i: (r.se(), r.se())
        for i in range(2) if modes[i] in ("L1", "Bi")
    }
    pred = (
        np.zeros((16, 16), dtype=np.int64),
        np.zeros((8, 8), dtype=np.int64),
        np.zeros((8, 8), dtype=np.int64),
    )
    for i, (gx, gy, w4, h4, dirn) in enumerate(parts):
        mv0 = mv1 = None
        if i in mvd0:
            mvp = predict_mv_part(st.mvf, gx, gy, w4, dirn)
            mv0 = (mvp[0] + mvd0[i][0], mvp[1] + mvd0[i][1])
            st.mvf.put_inter(gy, gx, h4, w4, mv0)
        else:
            st.mvf.put_intra(gy, gx, h4, w4)
        if i in mvd1:
            mvp = predict_mv_part(st.mvf1, gx, gy, w4, dirn)
            mv1 = (mvp[0] + mvd1[i][0], mvp[1] + mvd1[i][1])
            st.mvf1.put_inter(gy, gx, h4, w4, mv1)
        else:
            st.mvf1.put_intra(gy, gx, h4, w4)
        _b_paint_part(pred, (ref0, ref1), gx, gy, w4, h4, mx, my,
                      mv0, mv1)
    lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma = _read_inter_residual(
        r, st, mx, my
    )
    _recon_inter_mb(
        st, mx, my, pred[0], pred[1], pred[2],
        lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma,
    )


def _decode_b8x8_mb(r, st, mx: int, my: int, refs, counts):
    """Parse + reconstruct one B_8x8 macroblock (Table 7-18 sub
    types: B_Direct_8x8 and L0/L1/Bi at 8x8 / 8x4 / 4x8 / 4x4).
    Parse order per 7.3.5.2: four sub_mb_type codes, then all mvd_l0
    pairs (sub-partition raster order across the quadrants), then all
    mvd_l1 pairs.  Direct quadrants take the MACROBLOCK-level spatial
    direct derivation (8.4.1.2.2 — its refIdx/median inputs are the
    MB neighbours, all outside this MB, so deriving once up front is
    exact); coded sub-partitions use the 8.4.1.3.1 median at their
    own geometry, sequential within the MB."""
    import numpy as np

    from .h264_inter import predict_mv_part

    ref0, ref1, col = refs
    _bump(counts, "b8x8")
    subs = []
    for _ in range(4):
        smt = r.ue()
        if smt > 12:
            raise ValueError(f"invalid B sub_mb_type {smt}")
        subs.append(smt)
    gx0, gy0 = mx * 4, my * 4
    direct = None
    if any(s == 0 for s in subs):
        direct = _derive_direct(
            st.mvf, st.mvf1, col, st.inference8x8, mx, my,
            st.direct_temporal, st.pocs,
        )
    # sub-partition geometry in parse order
    order = []
    for part in range(4):
        mode, w4, h4 = _B_SUB_MODES[subs[part]]
        qx, qy = gx0 + (part & 1) * 2, gy0 + (part >> 1) * 2
        for sy in range(0, 2, h4):
            for sx in range(0, 2, w4):
                order.append((qx + sx, qy + sy, w4, h4, mode))
    mvd0 = {
        i: (r.se(), r.se())
        for i, (_gx, _gy, _w, _h, m) in enumerate(order)
        if m in ("L0", "Bi")
    }
    mvd1 = {
        i: (r.se(), r.se())
        for i, (_gx, _gy, _w, _h, m) in enumerate(order)
        if m in ("L1", "Bi")
    }
    pred = (
        np.zeros((16, 16), dtype=np.int64),
        np.zeros((8, 8), dtype=np.int64),
        np.zeros((8, 8), dtype=np.int64),
    )
    for i, (gx, gy, w4, h4, mode) in enumerate(order):
        if mode == "direct":
            use0, use1, mv0s, mv1s = direct
            for by in range(gy - gy0, gy - gy0 + h4):
                for bx in range(gx - gx0, gx - gx0 + w4):
                    bgx, bgy = gx0 + bx, gy0 + by
                    mv0 = mv0s[by][bx] if use0 else None
                    mv1 = mv1s[by][bx] if use1 else None
                    if use0:
                        st.mvf.put_inter(bgy, bgx, 1, 1, mv0)
                    else:
                        st.mvf.put_intra(bgy, bgx, 1, 1)
                    if use1:
                        st.mvf1.put_inter(bgy, bgx, 1, 1, mv1)
                    else:
                        st.mvf1.put_intra(bgy, bgx, 1, 1)
                    _b_paint_part(pred, (ref0, ref1), bgx, bgy, 1, 1,
                                  mx, my, mv0, mv1)
            continue
        mv0 = mv1 = None
        if i in mvd0:
            mvp = predict_mv_part(st.mvf, gx, gy, w4)
            mv0 = (mvp[0] + mvd0[i][0], mvp[1] + mvd0[i][1])
            st.mvf.put_inter(gy, gx, h4, w4, mv0)
        else:
            st.mvf.put_intra(gy, gx, h4, w4)
        if i in mvd1:
            mvp = predict_mv_part(st.mvf1, gx, gy, w4)
            mv1 = (mvp[0] + mvd1[i][0], mvp[1] + mvd1[i][1])
            st.mvf1.put_inter(gy, gx, h4, w4, mv1)
        else:
            st.mvf1.put_intra(gy, gx, h4, w4)
        _b_paint_part(pred, (ref0, ref1), gx, gy, w4, h4, mx, my,
                      mv0, mv1)
    lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma = _read_inter_residual(
        r, st, mx, my
    )
    _recon_inter_mb(
        st, mx, my, pred[0], pred[1], pred[2],
        lv_luma, cbp_luma, dc_c, ac_c, cbp_chroma,
    )


def decode_slice(
    r,
    sps: dict,
    pps: dict,
    qp: int,
    deblock_disabled: bool,
    slice_kind: str = "I",
    ref=None,
    counts: dict | None = None,
    alpha_off: int = 0,
    beta_off: int = 0,
    wp: dict | None = None,
    ref1=None,
    col: dict | None = None,
    motion_out: dict | None = None,
    direct_temporal: bool = False,
    pocs=None,
    n_ref0: int = 1,
):
    """Decode all macroblocks of a single-slice picture; `r` is
    positioned at the first slice_data element.  Returns (y, cb, cr)
    uint8 planes at macroblock-aligned (uncropped) size.

    I slices handle mb_type 25 (I_PCM), 0 (I_4x4) and 1..24 (I_16x16)
    in any mix.  P slices (slice_kind="P", `ref` = previous frame's
    uncropped planes) additionally handle every P partition shape
    over the single reference: mb_skip_run / P_Skip, P_L0_16x16, the
    two-partition shapes P_L0_L0_16x8 / 8x16, and P_8x8 /
    P_8x8ref0 sub-partitions down to 4x4.

    Unless `deblock_disabled`, the §8.7 in-loop deblocking filter runs
    over the reconstructed picture before it is returned (and hence
    before the caller stores it as a reference), with the slice
    header's alpha/beta offsets applied — default-flag baseline
    streams decode exactly.  When `counts` is a dict, the keys
    "i4"/"i16"/"ipcm"/"p16"/"pskip" are incremented per macroblock
    (probe/coverage instrumentation)."""
    st = _SliceState(sps, pps, qp)
    st.wp = wp
    st.direct_temporal = direct_temporal
    st.pocs = pocs
    is_p = slice_kind == "P"
    is_b = slice_kind == "B"
    if is_p and ref is None:
        raise ValueError("P slice without a decoded reference frame")
    # `ref` is the RefPicList0 (a list of (y, cb, cr) plane triples in
    # PicNum order) or a single triple (one active reference)
    refs0 = None
    if is_p:
        refs0 = ref if isinstance(ref, list) else [ref]
        if n_ref0 > len(refs0):
            raise ValueError(
                "num_ref_idx_l0_active exceeds the decoded-reference"
                " list"
            )
        st.n_ref0 = n_ref0
    if is_b and (ref is None or ref1 is None or col is None):
        raise ValueError(
            "B slice needs both temporal references and the"
            " colocated motion field"
        )
    refs_b = (ref, ref1, col)
    n_mbs = st.mbw * st.mbh
    mb = 0
    while mb < n_mbs:
        if is_p or is_b:
            run = r.ue()  # mb_skip_run (7.3.4)
            if mb + run > n_mbs:
                raise ValueError("mb_skip_run overruns the picture")
            for _ in range(run):
                my, mx = divmod(mb, st.mbw)
                if is_b:
                    _recon_bskip(st, mx, my, refs_b, counts)
                else:
                    _recon_pskip(st, mx, my, refs0, counts)
                mb += 1
            if mb >= n_mbs:
                break
        my, mx = divmod(mb, st.mbw)
        mb_type = r.ue()
        if is_p:
            from .h264_inter import P_INTRA_OFFSET

            if mb_type == 0:  # P_L0_16x16
                _decode_p16_mb(r, st, mx, my, refs0, counts)
                mb += 1
                continue
            if mb_type in (1, 2):  # P_L0_L0_16x8 / P_L0_L0_8x16
                _decode_p_part_mb(r, st, mx, my, refs0, mb_type,
                                  counts)
                mb += 1
                continue
            if mb_type in (3, 4):  # P_8x8 / P_8x8ref0
                _decode_p8x8_mb(r, st, mx, my, refs0, counts,
                                mb_type=mb_type)
                mb += 1
                continue
            # intra mb_type offset in P slices (7.4.5)
            mb_type -= P_INTRA_OFFSET
        elif is_b:
            from .h264_inter import B_INTRA_OFFSET

            if mb_type <= 3:  # Direct / L0 / L1 / Bi, all 16x16
                _decode_b_mb(r, st, mx, my, refs_b, mb_type, counts)
                mb += 1
                continue
            if mb_type <= 21:  # two-partition shapes (Table 7-14)
                _decode_b_part_mb(
                    r, st, mx, my, refs_b, mb_type, counts
                )
                mb += 1
                continue
            if mb_type == 22:  # B_8x8 sub-partitions (Table 7-18)
                _decode_b8x8_mb(r, st, mx, my, refs_b, counts)
                mb += 1
                continue
            # intra mb_type offset in B slices (7.4.5)
            mb_type -= B_INTRA_OFFSET
        _decode_intra_mb(r, st, mx, my, mb_type, counts)
        mb += 1
    if not deblock_disabled:
        from .h264_deblock import deblock_picture
        from .h264_inter import MvField

        bkw = {}
        if is_b:
            # two-list bS derivation (8.7.2.1): list-1 motion plus
            # per-block list-usage grids
            bkw = {
                "mvx4_l1": st.mvf1.mvx,
                "mvy4_l1": st.mvf1.mvy,
                "use0_4": st.mvf.state == MvField.INTER,
                "use1_4": st.mvf1.state == MvField.INTER,
            }
        deblock_picture(
            st.y, st.cb, st.cr, st.qp_mb, st.intra_mb, st.tc_y,
            st.mvf.mvx, st.mvf.mvy, st.cq_off, alpha_off, beta_off,
            ref4=st.mvf.ref, **bkw,
        )
    if motion_out is not None:
        # the caller keeps this alongside reference pictures: the
        # spatial-direct colocated test (8.4.1.2.2) reads the list-0
        # motion of RefPicList1[0]
        motion_out["state"] = st.mvf.state.copy()
        motion_out["mvx"] = st.mvf.mvx.copy()
        motion_out["mvy"] = st.mvf.mvy.copy()
        motion_out["ref"] = st.mvf.ref.copy()
    return st.planes_u8()


def decode_islice(
    r,
    sps: dict,
    pps: dict,
    qp: int,
    deblock_disabled: bool,
    counts: dict | None = None,
):
    """Back-compat wrapper: decode an I slice (see decode_slice)."""
    return decode_slice(
        r, sps, pps, qp, deblock_disabled, "I", None, counts
    )



def _read_chroma_residual(r, tc_c, mx: int, my: int, cbp_chroma: int):
    """Chroma residual parse for one macroblock (7.3.5.3.1 ordering:
    both DC blocks, then Cb ACs, then Cr ACs).  Returns (dc, ac) with
    dc[c] a 4-list and ac[c] four 15-lists; updates the per-component
    TotalCoeff grids."""
    dc = [[0] * 4, [0] * 4]
    ac = [[[0] * 15 for _ in range(4)] for _ in range(2)]
    if cbp_chroma:
        for c in range(2):
            dc[c], _tc = decode_residual_block(r, -1, 4)
    for c in range(2):
        for blk in range(4):
            cgx, cgy = mx * 2 + (blk & 1), my * 2 + (blk >> 1)
            if cbp_chroma == 2:
                n_c = _nc_from_grid(tc_c[c], cgx, cgy)
                ac[c][blk], tc = decode_residual_block(r, n_c, 15)
                tc_c[c][cgy, cgx] = tc
            else:
                tc_c[c][cgy, cgx] = 0
    return dc, ac


# ---------------------------------------------------------------------------
# Encoder twin
# ---------------------------------------------------------------------------
def _quant_dc_luma(dc_mat, qp: int) -> list[int]:
    """Forward luma DC: 4x4 Hadamard of the per-block DC transform
    coefficients, quantised with the JM intra deadzone, emitted in
    zigzag order (8.5.10 inverse)."""
    f = hadamard_4x4(dc_mat)
    m, qbits = qp % 6, 15 + qp // 6
    dz = (1 << qbits) // 3
    mf = QUANT_MF[m][0]
    out = []
    for k in range(16):
        pos = ZIGZAG_4x4[k]
        c = int(f[pos >> 2, pos & 3])
        lv = min((abs(c) * mf + 2 * dz) >> (qbits + 1), _LEVEL_CLAMP)
        out.append(lv if c >= 0 else -lv)
    return out


def _quant_dc_chroma(dc4: list[int], qpc: int) -> list[int]:
    """Forward chroma DC: 2x2 Hadamard + quantise, raster order
    (8.5.11 inverse)."""
    np = _np()
    f = hadamard_2x2(
        np.array([[dc4[0], dc4[1]], [dc4[2], dc4[3]]], dtype=np.int64)
    )
    m, qbits = qpc % 6, 15 + qpc // 6
    dz = (1 << qbits) // 3
    mf = QUANT_MF[m][0]
    out = []
    for i, j in ((0, 0), (0, 1), (1, 0), (1, 1)):
        c = int(f[i, j])
        lv = min((abs(c) * mf + 2 * dz) >> (qbits + 1), _LEVEL_CLAMP)
        out.append(lv if c >= 0 else -lv)
    return out


_MODES_4x4_NEED = {  # mode → (needs_top, needs_left)
    0: (True, False), 1: (False, True), 2: (False, False),
    3: (True, False), 4: (True, True), 5: (True, True),
    6: (True, True), 7: (True, False), 8: (False, True),
}


def _try_i4(y, dec4, src, mx: int, my: int, qp: int):
    """Tentative I_4x4 encode of one macroblock on scratch state:
    per-block best-SAD mode over the available subset, closed-loop
    reconstruction.  Returns (ssd, modes, levels-per-block, recon)."""
    np = _np()
    y2 = y.copy()
    dec2 = dec4.copy()
    w_pic = y.shape[1]
    modes: list[int] = []
    levels: list[list[int]] = []
    ssd = 0
    for blk in range(16):
        bx, by = _blk_xy(blk)
        px, py = mx * 16 + bx * 4, my * 16 + by * 4
        t, l, tl, have_t, have_l, have_tr = _gather4(
            y2, dec2, px, py, w_pic
        )
        s = src[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]
        best = None
        for mode in range(9):
            need_t, need_l = _MODES_4x4_NEED[mode]
            if (need_t and not have_t) or (need_l and not have_l):
                continue
            pred = predict_4x4(mode, t, l, tl, have_t, have_l, have_tr)
            sad = int(np.abs(pred - s).sum())
            if best is None or sad < best[0]:
                best = (sad, mode, pred)
        _sad, mode, pred = best
        lv = quant_4x4(forward_transform_4x4(s - pred), qp)
        rec = np.clip(
            pred + inverse_transform_4x4(dequant_4x4(lv, qp)), 0, 255
        )
        y2[py : py + 4, px : px + 4] = rec
        dec2[(my * 4 + by), (mx * 4 + bx)] = True
        ssd += int(((rec - s) ** 2).sum())
        modes.append(mode)
        levels.append(lv)
    recon = y2[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].copy()
    return ssd, modes, levels, recon


def _try_i16(y, src, mx: int, my: int, qp: int):
    """Tentative I_16x16 encode: best-SAD prediction mode, DC Hadamard
    + AC quantisation, closed-loop reconstruction.  Returns
    (ssd, pred_mode, dc_levels, ac_blocks, recon, luma_flag)."""
    np = _np()
    px, py = mx * 16, my * 16
    have_t, have_l = my > 0, mx > 0
    t = y[py - 1, px : px + 16] if have_t else np.zeros(16, np.int64)
    l = y[py : py + 16, px - 1] if have_l else np.zeros(16, np.int64)
    tl = int(y[py - 1, px - 1]) if have_t and have_l else 0
    best = None
    for mode in range(4):
        if mode == 0 and not have_t:
            continue
        if mode == 1 and not have_l:
            continue
        if mode == 3 and not (have_t and have_l):
            continue
        pred = predict_16x16(mode, t, l, tl, have_t, have_l)
        sad = int(np.abs(pred - src).sum())
        if best is None or sad < best[0]:
            best = (sad, mode, pred)
    _sad, mode, pred = best
    resid = src.astype(np.int64) - pred
    wt = forward_transform_4x4_batch(mb_to_blocks(resid))
    z2r, _ = _blk_z2r()
    dc_mat = np.zeros(16, dtype=np.int64)
    dc_mat[z2r] = wt[:, 0, 0]
    dc_mat = dc_mat.reshape(4, 4)
    ac_blocks = [b[1:] for b in quant_4x4_batch(wt, qp, skip_dc=True)]
    dc_levels = _quant_dc_luma(dc_mat, qp)
    luma_flag = any(any(b) for b in ac_blocks)
    if not luma_flag:
        ac_blocks = [[0] * 15 for _ in range(16)]
    recon = _recon_luma16_dc_ac(pred, dc_levels, ac_blocks, qp)
    ssd = int(((recon - src) ** 2).sum())
    return ssd, mode, dc_levels, ac_blocks, recon, luma_flag


def _quant_chroma_resid(preds, src_cb, src_cr, qpc: int):
    """Quantise the chroma residual for one macroblock given the two
    8x8 prediction blocks (intra prediction or motion compensation —
    the caller chooses).  Returns (cbp_chroma, dc[2][4], ac[2][4][15],
    recons[2]) with the reconstruction run through the decoder's own
    dequant path (closed loop), and with non-coded parts zeroed so the
    recon matches what a decoder reconstructs from the bits."""
    np = _np()
    dc = [[0] * 4, [0] * 4]
    ac = [[[0] * 15 for _ in range(4)] for _ in range(2)]
    for c, (pred, src) in enumerate(zip(preds, (src_cb, src_cr))):
        resid = src.astype(np.int64) - pred
        blocks = resid.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(
            4, 4, 4
        )
        wt = forward_transform_4x4_batch(blocks)
        dc4 = [int(v) for v in wt[:, 0, 0]]
        ac[c] = [b[1:] for b in quant_4x4_batch(wt, qpc, skip_dc=True)]
        dc[c] = _quant_dc_chroma(dc4, qpc)
    any_ac = any(any(b) for comp in ac for b in comp)
    any_dc = any(any(d) for d in dc)
    cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
    if cbp_chroma < 2:  # AC not coded → decoder reconstructs with 0s
        ac = [[[0] * 15 for _ in range(4)] for _ in range(2)]
    if cbp_chroma == 0:
        dc = [[0] * 4, [0] * 4]
    recons = []
    for c, pred in enumerate(preds):
        if cbp_chroma:
            recons.append(_recon_chroma(pred, dc[c], ac[c], qpc))
        else:
            recons.append(np.clip(pred, 0, 255))
    return cbp_chroma, dc, ac, recons


def _encode_chroma(cb, cr, src_cb, src_cr, mx: int, my: int, qpc: int):
    """Intra chroma for one macroblock: best-SAD prediction mode over
    the available subset, then the shared residual quantisation.
    Returns (mode, cbp_chroma, dc[2][4], ac[2][4][15], recon[2])."""
    np = _np()
    cx, cy = mx * 8, my * 8
    have_t, have_l = my > 0, mx > 0
    best = None
    for mode in range(4):
        if mode == 1 and not have_l:
            continue
        if mode == 2 and not have_t:
            continue
        if mode == 3 and not (have_t and have_l):
            continue
        # chroma mode numbering: 0 DC, 1 H, 2 V, 3 Plane
        sad = 0
        preds = []
        for plane, src in ((cb, src_cb), (cr, src_cr)):
            t = (
                plane[cy - 1, cx : cx + 8]
                if have_t
                else np.zeros(8, np.int64)
            )
            l = (
                plane[cy : cy + 8, cx - 1]
                if have_l
                else np.zeros(8, np.int64)
            )
            tl = int(plane[cy - 1, cx - 1]) if have_t and have_l else 0
            pred = predict_chroma(mode, t, l, tl, have_t, have_l)
            sad += int(np.abs(pred - src).sum())
            preds.append(pred)
        if best is None or sad < best[0]:
            best = (sad, mode, preds)
    _sad, mode, preds = best
    cbp_chroma, dc, ac, recons = _quant_chroma_resid(
        preds, src_cb, src_cr, qpc
    )
    return mode, cbp_chroma, dc, ac, recons


def _write_chroma_residual(
    w, tc_c, mx: int, my: int, cbp_chroma: int, dc, ac
):
    """Mirror of _read_chroma_residual (7.3.5.3.1 ordering)."""
    if cbp_chroma:
        for c in range(2):
            encode_residual_block(w, dc[c], -1)
    for c in range(2):
        for blk in range(4):
            cgx, cgy = mx * 2 + (blk & 1), my * 2 + (blk >> 1)
            if cbp_chroma == 2:
                n_c = _nc_from_grid(tc_c[c], cgx, cgy)
                tc_c[c][cgy, cgx] = encode_residual_block(
                    w, ac[c][blk], n_c
                )
            else:
                tc_c[c][cgy, cgx] = 0


class _EncState:
    """Per-frame encoder state mirroring _SliceState: reconstruction
    planes + the neighbour grids both syntax writing (nC, pred-mode
    inference, MV prediction) and closed-loop reconstruction need."""

    def __init__(self, mbw: int, mbh: int):
        np = _np()
        h, w = mbh * 16, mbw * 16
        self.mbw, self.mbh = mbw, mbh
        self.y = np.zeros((h, w), dtype=np.int64)
        self.cb = np.zeros((h // 2, w // 2), dtype=np.int64)
        self.cr = np.zeros((h // 2, w // 2), dtype=np.int64)
        self.tc_y = np.zeros((mbh * 4, mbw * 4), dtype=np.int64)
        self.tc_c = [
            np.zeros((mbh * 2, mbw * 2), dtype=np.int64)
            for _ in range(2)
        ]
        self.mode4 = np.full((mbh * 4, mbw * 4), 2, dtype=np.int64)
        self.dec4 = np.zeros((mbh * 4, mbw * 4), dtype=bool)
        from .h264_inter import MvField

        self.mvf = MvField(mbw, mbh)
        self.mvf1 = MvField(mbw, mbh)

    def planes_u8(self):
        np = _np()
        return (
            self.y.astype(np.uint8),
            self.cb.astype(np.uint8),
            self.cr.astype(np.uint8),
        )


def _encode_intra_mb(
    s,
    est: _EncState,
    mx: int,
    my: int,
    src_y_mb,
    src_cb_mb,
    src_cr_mb,
    qp: int,
    qpc: int,
    mb_type_offset: int = 0,
):
    """Closed-loop intra encode + syntax write for one macroblock
    (shared by the I-frame encoder and intra fallbacks inside P
    slices, which pass mb_type_offset=5 per Table 7-13)."""
    np = _np()
    mbw = est.mbw
    ssd4, modes, lv4, rec4 = _try_i4(
        est.y, est.dec4, src_y_mb, mx, my, qp
    )
    ssd16, pm16, dc_lv, ac_lv, rec16, luma_flag = _try_i16(
        est.y, src_y_mb, mx, my, qp
    )
    cmode, cbp_chroma, cdc, cac, crec = _encode_chroma(
        est.cb, est.cr, src_cb_mb, src_cr_mb, mx, my, qpc
    )
    if ssd4 < ssd16:  # ties → I_16x16 (fewer bits)
        s.ue(0 + mb_type_offset)  # mb_type I_4x4
        for blk in range(16):
            bx, by = _blk_xy(blk)
            gx, gy = mx * 4 + bx, my * 4 + by
            pm = _pred_mode_4x4(est.mode4, gx, gy)
            mode = modes[blk]
            if mode == pm:
                s.u(1, 1)
            else:
                s.u(0, 1)
                s.u(mode if mode < pm else mode - 1, 3)
            est.mode4[gy, gx] = mode
        cbp_luma = 0
        for q in range(4):
            if any(any(lv4[b]) for b in range(q * 4, q * 4 + 4)):
                cbp_luma |= 1 << q
        s.ue(cmode)
        cbp = cbp_luma | (cbp_chroma << 4)
        s.ue(CODENUM_FROM_CBP_INTRA[cbp])
        if cbp:
            s.se(0)  # mb_qp_delta
        for blk in range(16):
            bx, by = _blk_xy(blk)
            gx, gy = mx * 4 + bx, my * 4 + by
            if cbp_luma & (1 << (blk >> 2)):
                n_c = _nc_from_grid(est.tc_y, gx, gy)
                est.tc_y[gy, gx] = encode_residual_block(
                    s, lv4[blk], n_c
                )
            else:
                est.tc_y[gy, gx] = 0
        _write_chroma_residual(
            s, est.tc_c, mx, my, cbp_chroma, cdc, cac
        )
        # commit the tentative pass's reconstruction (identical state)
        est.y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = rec4
    else:
        mb_type = 1 + pm16 + 4 * cbp_chroma + (12 if luma_flag else 0)
        s.ue(mb_type + mb_type_offset)
        s.ue(cmode)
        s.se(0)  # mb_qp_delta
        n_c = _nc_from_grid(est.tc_y, mx * 4, my * 4)
        encode_residual_block(s, dc_lv, n_c)
        for blk in range(16):
            bx, by = _blk_xy(blk)
            gx, gy = mx * 4 + bx, my * 4 + by
            if luma_flag:
                n_c = _nc_from_grid(est.tc_y, gx, gy)
                est.tc_y[gy, gx] = encode_residual_block(
                    s, ac_lv[blk], n_c
                )
            else:
                est.tc_y[gy, gx] = 0
        _write_chroma_residual(
            s, est.tc_c, mx, my, cbp_chroma, cdc, cac
        )
        est.y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = rec16
    est.dec4[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = True
    est.mvf.put_intra(my * 4, mx * 4, 4, 4)  # intra MV context
    est.mvf1.put_intra(my * 4, mx * 4, 4, 4)
    cx, cy = mx * 8, my * 8
    est.cb[cy : cy + 8, cx : cx + 8] = crec[0]
    est.cr[cy : cy + 8, cx : cx + 8] = crec[1]


def _frames_to_planes(frames, yuv: bool):
    import numpy as np

    from finanalyzer_spark.operators.h264 import _rgb_to_yuv420

    frames = list(frames)
    if not frames:
        raise ValueError("need at least one frame")
    if yuv:
        planes = [
            tuple(np.asarray(p, dtype=np.uint8) for p in f)
            for f in frames
        ]
        h, w = planes[0][0].shape
    else:
        arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
        h, w = arrs[0].shape[:2]
        planes = [_rgb_to_yuv420(a) for a in arrs]
    if h % 16 or w % 16:
        raise ValueError("intra encoder needs multiple-of-16 dimensions")
    return planes, h, w


def encode_h264_intra(
    frames, qp: int = 28, yuv: bool = False, recon_out: list | None = None,
    deblock: bool = False,
) -> bytes:
    """Encoder twin for the CAVLC intra tier: an Annex-B baseline
    stream of IDR-only pictures coded with I_4x4 / I_16x16 spatial
    prediction, the 4x4 integer transform and CAVLC entropy — the
    shape of real intra-only H.264.  With `deblock=False` the filter
    is explicitly disabled in the slice header; with `deblock=True`
    the stream is a DEFAULT baseline stream (no deblocking-control
    syntax at all) and the encoder runs the §8.7 filter over each
    reconstruction, exactly as the decoder does.  Per-macroblock mode decision is closed-loop:
    both candidates are fully reconstructed through the decoder's own
    dequant + inverse-transform path and the lower-SSD one is kept, so
    decode(encode(x)) equals the encoder's reconstruction bit-for-bit
    (pinned by tests/test_h264_cavlc.py).  `frames` are (h, w, 3)
    uint8 RGB arrays, or (y, cb, cr) plane tuples with `yuv=True`;
    dimensions must be multiples of 16.  When `recon_out` is a list,
    the encoder appends its internal (y, cb, cr) reconstruction per
    frame — the exact-equality oracle the twin tests compare the
    decoder against."""
    import numpy as np

    from finanalyzer_spark.operators.h264 import (
        NAL_IDR,
        NAL_PPS,
        NAL_SPS,
        _BitWriter,
        _nal,
        write_sps_pps,
    )

    if not 0 <= qp <= 51:
        raise ValueError("qp must be in [0, 51]")
    planes, h, w = _frames_to_planes(frames, yuv)
    mbw, mbh = w // 16, h // 16
    qpc = chroma_qp(qp, 0)

    sps_rbsp, pps_rbsp = write_sps_pps(
        mbw, mbh, pic_init_qp=qp, deblocking_control=not deblock
    )
    out = bytearray()
    out += _nal(NAL_SPS, 3, sps_rbsp)
    out += _nal(NAL_PPS, 3, pps_rbsp)

    for fi, (src_y8, src_cb8, src_cr8) in enumerate(planes):
        src_y = src_y8.astype(np.int64)
        src_cb = src_cb8.astype(np.int64)
        src_cr = src_cr8.astype(np.int64)
        est = _EncState(mbw, mbh)

        s = _BitWriter()
        s.ue(0)        # first_mb_in_slice
        s.ue(7)        # slice_type: I (all slices in pic)
        s.ue(0)        # pps_id
        s.u(0, 8)      # frame_num
        s.ue(fi % 16)  # idr_pic_id
        s.u(0, 1)      # no_output_of_prior_pics
        s.u(0, 1)      # long_term_reference
        s.se(0)        # slice_qp_delta (pic_init_qp == qp)
        if not deblock:
            s.ue(1)    # disable_deblocking_filter_idc: filter off

        for mb in range(mbw * mbh):
            my, mx = divmod(mb, mbw)
            _encode_intra_mb(
                s, est, mx, my,
                src_y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16],
                src_cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                src_cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                qp, qpc,
            )
        s.rbsp_trailing()
        out += _nal(NAL_IDR, 3, bytes(s.out))
        if deblock:
            # in-loop: the encoder's reference/recon is the FILTERED
            # picture, mirroring decode_slice exactly (§8.7)
            from .h264_deblock import deblock_picture

            deblock_picture(
                est.y, est.cb, est.cr,
                np.full((mbh, mbw), qp, dtype=np.int64),
                np.ones((mbh, mbw), dtype=bool),
                est.tc_y, est.mvf.mvx, est.mvf.mvy, 0,
            )
        if recon_out is not None:
            recon_out.append(est.planes_u8())
    return bytes(out)
