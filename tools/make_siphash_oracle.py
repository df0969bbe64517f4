"""Generate the DuckDB oracle SQL for the ch_siphash_dialect graded
query (r9): a full SipHash-2-4 re-derivation in pure SQL.

The engine side hashes 1-7-byte digit strings (so there are NO 8-byte
compression blocks — the tail word, the 2 compression rounds, and the
4 finalization rounds carry everything). Each SipRound is emitted as
4 chained CTE stages over the (v0, v1, v2, v3) state:

  a: t0 = v0+v1,  t2 = v2+v3,  r1 = rotl(v1,13), r3 = rotl(v3,16)
  b: n1 = r1^t0,  n3 = r3^t2,  t0r = rotl(t0,32)
  c: u0 = t0r+n3, u2 = t2+n1
  d: v3' = rotl(n3,21)^u0, v1' = rotl(n1,17)^u2, v2' = rotl(u2,32),
     v0' = u0

Adds/rotls run in HUGEINT mod 2^64 (the ch_hash_dialect /
ch_murmur_dialect split-arithmetic pattern), xors in UBIGINT. The
generated SQL is pasted verbatim into queries_reference.py as
_SIPHASH_ORACLE — re-run this script and diff if the derivation ever
needs to change; tests/test_siphash_oracle_gen.py pins that the
committed constant matches this generator's output.
"""

from __future__ import annotations

M = "18446744073709551616::HUGEINT"

# SipHash initialization constants xor'd with the key; CH's key is
# (0, 0) so the init words are the spec's literals themselves
V0 = 0x736F6D6570736575
V1 = 0x646F72616E646F6D
V2 = 0x6C7967656E657261
V3 = 0x7465646279746573


def _add(a: str, b: str) -> str:
    return (
        f"CAST((CAST({a} AS HUGEINT) + CAST({b} AS HUGEINT)) % {M} "
        f"AS UBIGINT)"
    )


def _rotl(x: str, r: int) -> str:
    return (
        f"CAST(((CAST({x} AS HUGEINT) * {2 ** r}) % {M} "
        f"+ CAST({x} AS HUGEINT) // {2 ** (64 - r)}) AS UBIGINT)"
    )


def _xor(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def sip_round_ctes(tag: str, prev: str, v: tuple[str, str, str, str]):
    """Emit the 4 CTE stages of one SipRound; returns (ctes, last_name,
    new_state_columns)."""
    v0, v1, v2, v3 = v
    a, b, c, d = f"{tag}a", f"{tag}b", f"{tag}c", f"{tag}d"
    ctes = [
        f"{a} AS (SELECT v, {_add(v0, v1)} AS t0, {_add(v2, v3)} AS t2,\n"
        f"      {_rotl(v1, 13)} AS r1,\n"
        f"      {_rotl(v3, 16)} AS r3 FROM {prev})",
        f"{b} AS (SELECT v, t0, t2, {_xor('r1', 't0')} AS n1,\n"
        f"      {_xor('r3', 't2')} AS n3,\n"
        f"      {_rotl('t0', 32)} AS t0r FROM {a})",
        f"{c} AS (SELECT v, n1, n3, {_add('t0r', 'n3')} AS u0,\n"
        f"      {_add('t2', 'n1')} AS u2 FROM {b})",
        f"{d} AS (SELECT v, u0 AS s0,\n"
        f"      {_xor(_rotl('n1', 17), 'u2')} AS s1,\n"
        f"      {_rotl('u2', 32)} AS s2,\n"
        f"      {_xor(_rotl('n3', 21), 'u0')} AS s3 FROM {c})",
    ]
    return ctes, d, ("s0", "s1", "s2", "s3")


def generate() -> str:
    ctes = [
        # the shared input formula (identical on the engine side)
        """u0_in AS (
      SELECT DISTINCT user_id % list_extract(
               [10, 100, 1000, 10000, 100000, 1000000, 10000000],
               CAST(user_id % 7 AS INT) + 1) AS v
      FROM events WHERE user_id IS NOT NULL)""",
        """sb AS (
      SELECT v, CAST(v AS VARCHAR) AS s FROM u0_in)""",
        """sm AS (
      SELECT v,
             CAST((list_reduce(
                     list_reverse(list_transform(
                       generate_series(1, length(s)),
                       i -> CAST(ord(substr(s, CAST(i AS INT), 1))
                                 AS HUGEINT))),
                     (a, x) -> a * 256 + x)
                   + CAST(length(s) AS HUGEINT) * 72057594037927936)
                  % """ + M + """ AS UBIGINT) AS m
      FROM sb)""",
        # state init (key 0,0) + v3 ^= m
        f"""st0 AS (
      SELECT v, m,
             CAST({V0} AS UBIGINT) AS a0,
             CAST({V1} AS UBIGINT) AS a1,
             CAST({V2} AS UBIGINT) AS a2,
             xor(CAST({V3} AS UBIGINT), m) AS a3
      FROM sm)""",
    ]
    state = ("a0", "a1", "a2", "a3")
    prev = "st0"
    # carry m through the two compression rounds
    for i in (1, 2):
        cs, prev, state = sip_round_ctes(f"c{i}", prev, state)
        # re-attach m for the post-compression xor
        cs = [x.replace("SELECT v,", "SELECT v, m,", 1) for x in cs]
        ctes.extend(cs)
    # v0 ^= m; v2 ^= 0xff
    ctes.append(
        f"fin0 AS (SELECT v, xor({state[0]}, m) AS b0, {state[1]} AS b1,\n"
        f"      xor({state[2]}, CAST(255 AS UBIGINT)) AS b2,\n"
        f"      {state[3]} AS b3 FROM {prev})"
    )
    state = ("b0", "b1", "b2", "b3")
    prev = "fin0"
    for i in (1, 2, 3, 4):
        cs, prev, state = sip_round_ctes(f"f{i}", prev, state)
        ctes.extend(cs)
    final = (
        f"SELECT CAST(v AS BIGINT) AS v,\n"
        f"       CAST(CASE WHEN CAST(h AS HUGEINT)\n"
        f"                      >= 9223372036854775808::HUGEINT\n"
        f"                 THEN CAST(h AS HUGEINT)\n"
        f"                      - {M}\n"
        f"                 ELSE CAST(h AS HUGEINT) END AS BIGINT) AS sip\n"
        f"FROM (SELECT v, xor(xor({state[0]}, {state[1]}),\n"
        f"                    xor({state[2]}, {state[3]})) AS h\n"
        f"      FROM {prev})"
    )
    return "\n    WITH " + ",\n    ".join(ctes) + "\n    " + final + "\n"


if __name__ == "__main__":
    print(generate())
