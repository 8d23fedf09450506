"""Port of the .NET Framework System.Random PRNG (Knuth subtractive generator).

Needed to reproduce the reference's seeded test vectors exactly (e.g.
``new Random(123)`` in IntegerRunLengthEncodingV2_Test.cs:298-307 and
WriterTest.App/Program.cs:15). Algorithm is public (.NET reference source).
"""

MBIG = 0x7FFFFFFF


class DotNetRandom:
    def __init__(self, seed: int):
        self.seed_array = [0] * 56
        subtraction = MBIG if seed == -0x80000000 else abs(seed)
        mj = 161803398 - subtraction
        self.seed_array[55] = mj
        mk = 1
        for i in range(1, 55):
            ii = (21 * i) % 55
            self.seed_array[ii] = mk
            mk = mj - mk
            if mk < 0:
                mk += MBIG
            mj = self.seed_array[ii]
        for _ in range(1, 5):
            for i in range(1, 56):
                self.seed_array[i] -= self.seed_array[1 + (i + 30) % 55]
                if self.seed_array[i] < 0:
                    self.seed_array[i] += MBIG
        self.inext = 0
        self.inextp = 21

    def _internal_sample(self) -> int:
        inext = self.inext + 1
        if inext >= 56:
            inext = 1
        inextp = self.inextp + 1
        if inextp >= 56:
            inextp = 1
        ret = self.seed_array[inext] - self.seed_array[inextp]
        if ret == MBIG:
            ret -= 1
        if ret < 0:
            ret += MBIG
        self.seed_array[inext] = ret
        self.inext = inext
        self.inextp = inextp
        return ret

    def next(self) -> int:
        """Random.Next(): non-negative int32."""
        return self._internal_sample()

    def next_max(self, max_value: int) -> int:
        """Random.Next(maxValue)."""
        return int(self._internal_sample() * (1.0 / MBIG) * max_value)

    def next_double(self) -> float:
        return self._internal_sample() * (1.0 / MBIG)

    def next_bytes(self, count: int) -> bytes:
        return bytes(self._internal_sample() & 0xFF for _ in range(count))
