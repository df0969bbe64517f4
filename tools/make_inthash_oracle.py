"""Generate the DuckDB oracle SQL for ch_hash_int_dialect (r9): full
re-derivations of murmurHash3_32 / murmurHash3_64 / sipHash64 /
xxHash64 over 8-BYTE little-endian integer input — the engine side
takes the VECTORIZED integer lane (functions/hash_vec.py), so this
grades that lane end-to-end with genuine independence.

8-byte input shapes, per spec:
- Murmur3 x86_32: exactly two 4-byte blocks (low32, high32), no tail.
- Murmur3 x64_128: one 8-byte k1 tail (no 16-byte block, k2 = 0).
- SipHash-2-4: ONE compression block (the 8 bytes) then the tail word
  carrying only the length byte (8 << 56) — 2+2+4 rounds total.
- XXH64 (len < 32): seed+P5+8, one 8-byte lane merge, avalanche.

All mults run in HUGEINT with split-multiply mod 2^64 (constants
split hi32/lo32 so products stay inside INT128), xors/shifts in
UBIGINT — the ch_hash/ch_murmur/ch_siphash oracle pattern. Pinned:
tests/test_inthash_oracle_gen.py asserts the committed constant
equals this generator's output.
"""

from __future__ import annotations

M = "18446744073709551616::HUGEINT"
M32 = "4294967296"


def _u64(c: int) -> tuple[int, int]:
    return c >> 32, c & 0xFFFFFFFF


def mult64(x: str, c: int) -> str:
    hi, lo = _u64(c)
    return (
        f"(({x} * {lo}) % {M} + (({x} * {hi}) % {M32}) * {M32}) % {M}"
    )


def rotl64(x: str, r: int) -> str:
    return f"(({x} * {2 ** r}) % {M} + {x} // {2 ** (64 - r)})"


def xor64(a: str, b: str) -> str:
    return (
        f"CAST(xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT)) "
        f"AS HUGEINT)"
    )


def shr_xor(x: str, r: int) -> str:
    """x ^ (x >> r) in UBIGINT, back to HUGEINT."""
    return (
        f"CAST(xor(CAST({x} AS UBIGINT), CAST({x} AS UBIGINT) "
        f">> {r}) AS HUGEINT)"
    )


def fmix64_ctes(tag: str, prev: str, src: str) -> tuple[list, str, str]:
    a, b, c, d, e = (f"{tag}{i}" for i in "abcde")
    ctes = [
        f"{a} AS (SELECT *, {shr_xor(src, 33)} AS {tag}_x1 FROM {prev})",
        f"{b} AS (SELECT *, {mult64(f'{tag}_x1', 0xFF51AFD7ED558CCD)} "
        f"AS {tag}_x2 FROM {a})",
        f"{c} AS (SELECT *, {shr_xor(f'{tag}_x2', 33)} AS {tag}_x3 "
        f"FROM {b})",
        f"{d} AS (SELECT *, {mult64(f'{tag}_x3', 0xC4CEB9FE1A85EC53)} "
        f"AS {tag}_x4 FROM {c})",
        f"{e} AS (SELECT *, {shr_xor(f'{tag}_x4', 33)} AS {tag}_out "
        f"FROM {d})",
    ]
    return ctes, e, f"{tag}_out"


def sip_round_ctes(tag: str, prev: str, v) -> tuple[list, str, tuple]:
    v0, v1, v2, v3 = v
    a, b, c, d = f"{tag}a", f"{tag}b", f"{tag}c", f"{tag}d"
    add = lambda p, q: f"(({p} + {q}) % {M})"  # noqa: E731
    ctes = [
        f"{a} AS (SELECT *, {add(v0, v1)} AS {tag}_t0, "
        f"{add(v2, v3)} AS {tag}_t2, {rotl64(v1, 13)} AS {tag}_r1, "
        f"{rotl64(v3, 16)} AS {tag}_r3 FROM {prev})",
        f"{b} AS (SELECT *, {xor64(f'{tag}_r1', f'{tag}_t0')} AS "
        f"{tag}_n1, {xor64(f'{tag}_r3', f'{tag}_t2')} AS {tag}_n3, "
        f"{rotl64(f'{tag}_t0', 32)} AS {tag}_t0r FROM {a})",
        f"{c} AS (SELECT *, {add(f'{tag}_t0r', f'{tag}_n3')} AS "
        f"{tag}_u0, {add(f'{tag}_t2', f'{tag}_n1')} AS {tag}_u2 "
        f"FROM {b})",
        f"{d} AS (SELECT *, {tag}_u0 AS {tag}_s0, "
        f"{xor64(rotl64(f'{tag}_n1', 17), f'{tag}_u2')} AS {tag}_s1, "
        f"{rotl64(f'{tag}_u2', 32)} AS {tag}_s2, "
        f"{xor64(rotl64(f'{tag}_n3', 21), f'{tag}_u0')} AS {tag}_s3 "
        f"FROM {c})",
    ]
    return ctes, d, (f"{tag}_s0", f"{tag}_s1", f"{tag}_s2", f"{tag}_s3")


def generate() -> str:
    ctes = [
        """u0_in AS (
      SELECT DISTINCT CAST(user_id % 100000000 AS BIGINT) AS v
      FROM events WHERE user_id IS NOT NULL)""",
        # x = the 8-byte LE form's unsigned value (v >= 0 here, but the
        # two's-complement fold keeps it general)
        f"""x0 AS (
      SELECT v, ((CAST(v AS HUGEINT) % {M}) + {M}) % {M} AS x
      FROM u0_in)""",
    ]
    prev = "x0"

    # ---- Murmur3 x86_32: two blocks (low32, high32), no tail --------
    def m32_block(tag, prev, hsrc, bsrc):
        a, b, c, d = f"{tag}a", f"{tag}b", f"{tag}c", f"{tag}d"
        cs = [
            f"{a} AS (SELECT *, ({bsrc} * 3432918353) % {M32} AS "
            f"{tag}_k1 FROM {prev})",
            f"{b} AS (SELECT *, (({tag}_k1 * 32768) % {M32} + "
            f"{tag}_k1 // 131072) AS {tag}_k2 FROM {a})",
            f"{c} AS (SELECT *, {xor64(hsrc, f'(({tag}_k2 * 461845907) % {M32})')} "
            f"AS {tag}_hx FROM {b})",
            f"{d} AS (SELECT *, ((({tag}_hx * 8192) % {M32} + "
            f"{tag}_hx // 524288) * 5 + 3864292196) % {M32} AS "
            f"{tag}_h FROM {c})",
        ]
        return cs, d, f"{tag}_h"

    cs, prev, h = m32_block("ma", prev, "0::HUGEINT", f"(x % {M32})")
    ctes.extend(cs)
    cs, prev, h = m32_block("mb", prev, h, f"(x // {M32})")
    ctes.extend(cs)
    ctes.append(
        f"mf0 AS (SELECT *, {xor64(h, '8::HUGEINT')} AS mf_f0 "
        f"FROM {prev})"
    )
    prev = "mf0"
    ctes.append(
        f"mf1 AS (SELECT *, {shr_xor('mf_f0', 16)} AS mf_f1 "
        f"FROM {prev})"
    )
    ctes.append(
        f"mf2 AS (SELECT *, (mf_f1 * 2246822507) % {M32} AS mf_f2 "
        f"FROM mf1)"
    )
    ctes.append(
        f"mf3 AS (SELECT *, {shr_xor('mf_f2', 13)} AS mf_f3 FROM mf2)"
    )
    ctes.append(
        f"mf4 AS (SELECT *, (mf_f3 * 3266489909) % {M32} AS mf_f4 "
        f"FROM mf3)"
    )
    ctes.append(
        f"mf5 AS (SELECT *, {shr_xor('mf_f4', 16)} AS m32_out "
        f"FROM mf4)"
    )
    prev = "mf5"

    # ---- Murmur3 x64_128: 8-byte k1 tail, k2 = 0 ---------------------
    ctes.append(
        f"q1 AS (SELECT *, {mult64('x', 0x87C37B91114253D5)} AS q_1 "
        f"FROM {prev})"
    )
    ctes.append(f"q2 AS (SELECT *, {rotl64('q_1', 31)} AS q_2 FROM q1)")
    ctes.append(
        f"q3 AS (SELECT *, {mult64('q_2', 0x4CF5AD432745937F)} AS q_3 "
        f"FROM q2)"
    )
    ctes.append(
        f"q4 AS (SELECT *, {xor64('q_3', '8::HUGEINT')} AS q_h1, "
        f"8::HUGEINT AS q_h2 FROM q3)"
    )
    ctes.append(
        f"q5 AS (SELECT *, (q_h1 + q_h2) % {M} AS q_h1b FROM q4)"
    )
    ctes.append(
        f"q6 AS (SELECT *, (q_h2 + q_h1b) % {M} AS q_h2b FROM q5)"
    )
    prev = "q6"
    cs, prev, f1 = fmix64_ctes("qf1", prev, "q_h1b")
    ctes.extend(cs)
    cs, prev, f2 = fmix64_ctes("qf2", prev, "q_h2b")
    ctes.extend(cs)
    ctes.append(
        f"q7 AS (SELECT *, ({f1} + {f2}) % {M} AS q_e1 FROM {prev})"
    )
    ctes.append(
        f"q8 AS (SELECT *, ({f2} + q_e1) % {M} AS q_e2 FROM q7)"
    )
    ctes.append(
        f"q9 AS (SELECT *, {xor64('q_e1', 'q_e2')} AS m64_out FROM q8)"
    )
    prev = "q9"

    # ---- SipHash-2-4, key (0,0): one block + length-byte tail -------
    V = (0x736F6D6570736575, 0x646F72616E646F6D,
         0x6C7967656E657261, 0x7465646279746573)
    ctes.append(
        f"s0 AS (SELECT *, {V[0]}::HUGEINT AS s_a0, "
        f"{V[1]}::HUGEINT AS s_a1, {V[2]}::HUGEINT AS s_a2, "
        f"{xor64(str(V[3]) + '::HUGEINT', 'x')} AS s_a3 FROM {prev})"
    )
    prev = "s0"
    state = ("s_a0", "s_a1", "s_a2", "s_a3")
    for i in (1, 2):
        cs, prev, state = sip_round_ctes(f"sc{i}", prev, state)
        ctes.extend(cs)
    ctes.append(
        f"s1 AS (SELECT *, {xor64(state[0], 'x')} AS s_b0, "
        f"{xor64(state[3], '576460752303423488::HUGEINT')} AS s_b3 "
        f"FROM {prev})"  # 8 << 56 = 576460752303423488
    )
    prev = "s1"
    state = ("s_b0", state[1], state[2], "s_b3")
    for i in (3, 4):
        cs, prev, state = sip_round_ctes(f"sc{i}", prev, state)
        ctes.extend(cs)
    ctes.append(
        f"s2 AS (SELECT *, {xor64(state[0], '576460752303423488::HUGEINT')} "
        f"AS s_c0, {xor64(state[2], '255::HUGEINT')} AS s_c2 "
        f"FROM {prev})"
    )
    prev = "s2"
    state = ("s_c0", state[1], "s_c2", state[3])
    for i in (5, 6, 7, 8):
        cs, prev, state = sip_round_ctes(f"sf{i}", prev, state)
        ctes.extend(cs)
    ctes.append(
        f"s3 AS (SELECT *, {xor64(xor64(state[0], state[1]), xor64(state[2], state[3]))} "
        f"AS sip_out FROM {prev})"
    )
    prev = "s3"

    # ---- XXH64 (seed 0, 8 bytes): P5+8, one lane merge, avalanche ---
    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    ctes.append(
        f"x1 AS (SELECT *, {mult64('x', P2)} AS x_k0 FROM {prev})"
    )
    ctes.append(f"x2 AS (SELECT *, {rotl64('x_k0', 31)} AS x_k1 FROM x1)")
    ctes.append(
        f"x3 AS (SELECT *, {mult64('x_k1', P1)} AS x_k2 FROM x2)"
    )
    ctes.append(
        f"x4 AS (SELECT *, {xor64(str((P5 + 8) % (1 << 64)) + '::HUGEINT', 'x_k2')} "
        f"AS x_h0 FROM x3)"
    )
    ctes.append(f"x5 AS (SELECT *, {rotl64('x_h0', 27)} AS x_h1 FROM x4)")
    ctes.append(
        f"x6 AS (SELECT *, ({mult64('x_h1', P1)} + {P4}) % {M} AS x_h2 "
        f"FROM x5)"
    )
    ctes.append(f"x7 AS (SELECT *, {shr_xor('x_h2', 33)} AS x_v1 FROM x6)")
    ctes.append(
        f"x8 AS (SELECT *, {mult64('x_v1', P2)} AS x_v2 FROM x7)"
    )
    ctes.append(f"x9 AS (SELECT *, {shr_xor('x_v2', 29)} AS x_v3 FROM x8)")
    ctes.append(
        f"xa AS (SELECT *, {mult64('x_v3', P3)} AS x_v4 FROM x9)"
    )
    ctes.append(
        f"xb AS (SELECT *, {shr_xor('x_v4', 32)} AS xx_out FROM xa)"
    )
    prev = "xb"

    sgn = (
        "CAST(CASE WHEN {0} >= 9223372036854775808::HUGEINT "
        "THEN {0} - " + M + " ELSE {0} END AS BIGINT)"
    )
    final = (
        "SELECT CAST(v AS BIGINT) AS v,\n"
        "       CAST(m32_out AS BIGINT) AS m32,\n"
        f"       {sgn.format('m64_out')} AS m64,\n"
        f"       {sgn.format('sip_out')} AS sip,\n"
        f"       {sgn.format('xx_out')} AS xx\n"
        f"FROM {prev}"
    )
    return "\n    WITH " + ",\n    ".join(ctes) + "\n    " + final + "\n"


if __name__ == "__main__":
    print(generate())
