"""Test-only shorten v1/v2 bitstream ENCODER + forward simulator.

The repo ships two shorten decoders (pure-Python ``io/sphere.py`` and the
C++ ``csrc/shorten.cpp``) whose prior fuzz coverage proved no-crash on
garbage; this module generates *structurally valid* streams covering all
predictor types (ZERO/DIFF0-3/QLPC), mid-stream blocksize and bitshift
changes, every sample type (AU1/AU2/ulaw/S8/U8/S16/U16), multi-channel
interleave, and both versions — together with the exact samples the
stream encodes, computed by an independent scalar forward simulation of
the format spec (reference: sph2pipe's shorten_x.c, mirrored by
reference _sphere.py:122-317).  Tests assert pure-Python == native C++
== the simulator, bit-exact, across seeds.

The encoder picks TARGET samples first and derives the residuals from
the simulated predictor state, so every generated value is in range for
its sample type by construction.
"""

import struct

import numpy as np

from speech_tpu.io.sphere import (
    NEGATIVE_ULAW_ZERO,
    ULAW2PCM,
    _LPCQUANT,
    _MAGIC,
    _NWRAP,
    _TYPE_AU1,
    _TYPE_AU2,
    _TYPE_S8,
    _TYPE_S16HL,
    _TYPE_S16LH,
    _TYPE_U8,
    _TYPE_U16HL,
    _TYPE_U16LH,
    _TYPE_ULAW,
    _trunc_div,
)
from speech_tpu.io._ulaw_outward import ULAW_OUTWARD

_FN_DIFF0, _FN_DIFF1, _FN_DIFF2, _FN_DIFF3 = 0, 1, 2, 3
_FN_QUIT, _FN_BLOCKSIZE, _FN_BITSHIFT, _FN_QLPC, _FN_ZERO = 4, 5, 6, 7, 8
_ULONGSIZE = 2
_FNSIZE = 2
_ENERGYSIZE = 3
_BITSHIFTSIZE = 2
_LPCQSIZE = 2


class BitWriter:
    """MSB-first writer over big-endian 32-bit words (the decoder's
    ``_BitReader`` mirrored)."""

    def __init__(self):
        self._out = bytearray()
        self._word = 0
        self._avail = 32

    def put(self, value: int, nbits: int) -> None:
        assert 0 <= value < (1 << nbits) if nbits else value == 0
        while nbits:
            take = min(nbits, self._avail)
            self._avail -= take
            nbits -= take
            self._word |= ((value >> nbits) & ((1 << take) - 1)) << self._avail
            if not self._avail:
                self._out += struct.pack(">I", self._word)
                self._word = 0
                self._avail = 32

    def uvar(self, value: int, nbits: int) -> None:
        high = value >> nbits
        for _ in range(high):
            self.put(0, 1)
        self.put(1, 1)
        if nbits:
            self.put(value & ((1 << nbits) - 1), nbits)

    def ulong(self, value: int) -> None:
        nbit = int(value).bit_length()
        self.uvar(nbit, _ULONGSIZE)
        self.uvar(value, nbit)

    def var(self, value: int, nbits: int) -> None:
        u = (value << 1) if value >= 0 else (((-value - 1) << 1) | 1)
        self.uvar(u, nbits + 1)

    def getvalue(self) -> bytes:
        out = bytes(self._out)
        if self._avail < 32:
            out += struct.pack(">I", self._word)
        else:
            out += struct.pack(">I", 0)  # decoder may prefetch one word
        return out


def _type_range(ftype):
    if ftype == _TYPE_AU1:
        return -128, 127
    if ftype == _TYPE_AU2:
        return -129, 127
    if ftype == _TYPE_S8:
        return -128, 127
    if ftype == _TYPE_U8:
        return 0, 255
    if ftype == _TYPE_ULAW:
        return 0, 255
    if ftype in (_TYPE_U16HL, _TYPE_U16LH):
        return 0, 32767  # int16 output buffer: stay in its range
    return -32768, 32767


def _emit_output(block, bitshift, ftype, convert):
    """_fix_bitshift + final conversion, per decoded block value."""
    out = []
    for b in block:
        if ftype == _TYPE_AU1:
            v = int(ULAW_OUTWARD[bitshift][b + 128])
        elif ftype == _TYPE_AU2:
            if b >= 0:
                v = int(ULAW_OUTWARD[bitshift][min(b, 127) + 128])
            elif b == -1:
                v = NEGATIVE_ULAW_ZERO
            else:
                v = int(ULAW_OUTWARD[bitshift][max(b, -129) + 129])
        else:
            v = b << bitshift
        if convert:
            v = int(ULAW2PCM[v])
        out.append(v)
    return out


def generate(seed: int):
    """One structurally valid stream.

    Returns ``(payload, expected, nchan)``: the shorten payload bytes
    (magic + version + bitstream), the expected interleaved int16/int
    output array, and the channel count.
    """
    rng = np.random.RandomState(seed)
    version = int(rng.choice([1, 2]))
    ftype = int(
        rng.choice(
            [
                _TYPE_AU1,
                _TYPE_AU2,
                _TYPE_S8,
                _TYPE_U8,
                _TYPE_ULAW,
                _TYPE_S16HL,
                _TYPE_S16LH,
                _TYPE_U16HL,
                _TYPE_U16LH,
            ]
        )
    )
    nchan = int(rng.choice([1, 1, 2, 3]))
    blocksize = int(rng.randint(3, 24))
    maxnlpc = int(rng.choice([0, 3, 7]))
    nmean = int(rng.choice([0, 2, 4]))
    nrounds = int(rng.randint(2, 8))
    au = ftype in (_TYPE_AU1, _TYPE_AU2)
    convert = au  # decoders are driven with an int16 output buffer

    w = BitWriter()
    w.ulong(ftype)
    w.ulong(nchan)
    w.ulong(blocksize)
    w.ulong(maxnlpc)
    w.ulong(nmean)
    w.ulong(0)  # nskip

    if ftype == _TYPE_U8:
        mean = 0x8  # sph2pipe quirk
    elif ftype in (_TYPE_U16HL, _TYPE_U16LH):
        mean = 0x8000
    else:
        mean = 0

    nwrap = max(maxnlpc, _NWRAP)
    nblock = max(1, nmean)
    hist = [[0] * nwrap for _ in range(nchan)]
    offsets = [[mean] * nblock for _ in range(nchan)]
    bitshift = 0
    lpcqoffset = (1 << _LPCQUANT) if version > 1 else 0
    lo, hi = _type_range(ftype)
    expected = []  # interleaved final outputs

    for _round in range(nrounds):
        # global state changes between rounds only (the decoder applies
        # them immediately; mid-round changes would desync channels)
        if rng.rand() < 0.3:
            blocksize = int(rng.randint(3, 24))
            w.uvar(_FN_BLOCKSIZE, _FNSIZE)
            w.ulong(blocksize)
        if rng.rand() < 0.3:
            # AU tables cover shifts 0..12; 16-bit shifted outputs must
            # stay in range
            bitshift = int(rng.randint(0, 4))
            w.uvar(_FN_BITSHIFT, _FNSIZE)
            w.uvar(bitshift, _BITSHIFTSIZE)
        slo = lo if au else _trunc_div(lo, 1 << bitshift)
        shi = hi if au else hi >> bitshift

        round_blocks = []
        for c in range(nchan):
            cmds = [_FN_ZERO, _FN_DIFF0, _FN_DIFF1, _FN_DIFF2, _FN_DIFF3]
            if maxnlpc:
                cmds.append(_FN_QLPC)
            cmd = int(rng.choice(cmds))
            if nmean:
                total = 0 if version < 2 else nmean // 2
                total += sum(offsets[c][:nmean])
                coffset = _trunc_div(total, nmean)
                if version >= 2:
                    coffset >>= bitshift
            else:
                coffset = offsets[c][0]

            if cmd == _FN_ZERO:
                w.uvar(_FN_ZERO, _FNSIZE)
                block = [0] * blocksize
            else:
                resn = int(rng.randint(0, 7))
                # target samples: a bounded random walk in range
                cur = int(rng.randint(max(slo, -2000), min(shi, 2000) + 1))
                targets = []
                for _ in range(blocksize):
                    cur = int(
                        np.clip(cur + rng.randint(-9, 10), slo, shi)
                    )
                    targets.append(cur)
                if ftype == _TYPE_AU2 and rng.rand() < 0.5:
                    targets[rng.randint(blocksize)] = -1  # NEG ulaw zero
                w.uvar(cmd, _FNSIZE)
                w.uvar(resn, _ENERGYSIZE)
                h = hist[c]
                block = targets
                if cmd == _FN_DIFF0:
                    for t in targets:
                        w.var(t - coffset, resn)
                elif cmd == _FN_DIFF1:
                    prev = h[-1]
                    for t in targets:
                        w.var(t - prev, resn)
                        prev = t
                elif cmd == _FN_DIFF2:
                    p1, p2 = h[-1], h[-2]
                    for t in targets:
                        w.var(t - (2 * p1 - p2), resn)
                        p2, p1 = p1, t
                elif cmd == _FN_DIFF3:
                    p1, p2, p3 = h[-1], h[-2], h[-3]
                    for t in targets:
                        w.var(t - (3 * (p1 - p2) + p3), resn)
                        p3, p2, p1 = p2, p1, t
                else:  # QLPC: nlpc + coeffs, then residuals vs the
                    # quantized-LPC prediction over offset-removed history
                    nlpc = int(rng.randint(1, maxnlpc + 1))
                    qlpc = [int(rng.randint(-40, 41)) for _ in range(nlpc)]
                    w.uvar(nlpc, _LPCQSIZE)
                    for q in qlpc:
                        w.var(q, _LPCQUANT)
                    ext = [hv - coffset for hv in h[nwrap - nlpc :]]
                    for t in targets:
                        ti = t - coffset
                        acc = lpcqoffset
                        for j in range(nlpc):
                            acc += qlpc[j] * ext[len(ext) - 1 - j]
                        w.var(ti - (acc >> _LPCQUANT), resn)
                        ext.append(ti)
            # offsets update + history wrap (every data command)
            if nmean > 0:
                total = 0 if version < 2 else blocksize // 2
                total += sum(block)
                new_off = _trunc_div(total, blocksize)
                if version >= 2:
                    new_off <<= bitshift
                offsets[c] = offsets[c][1:nmean] + [new_off] + offsets[c][
                    nmean:
                ]
            if nwrap <= blocksize:
                hist[c] = list(block[blocksize - nwrap :])
            else:
                hist[c] = hist[c][blocksize:] + list(block)
            round_blocks.append(
                _emit_output(block, bitshift, ftype, convert)
            )
        # interleave the round
        for i in range(blocksize):
            for c in range(nchan):
                expected.append(round_blocks[c][i])

    w.uvar(_FN_QUIT, _FNSIZE)
    payload = _MAGIC + bytes([version]) + w.getvalue()
    return payload, np.asarray(expected, dtype=np.int64), nchan
