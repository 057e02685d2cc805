"""Pipeline configuration.

The "reference config" maps 1:1 onto the signature constants of the
reference implementation (see SURVEY.md §7):

- shingle_width = 16   : RAB_POLYNOMIAL_WIN_SIZE (rabin/rabin_dedup.h:90)
- minhash_k     = 20   : K min-values per segment = 100 / DEFAULT_PCT_INTERVAL(5)
                         (rabin/global/index.c:183-186, rabin_dedup.c:976-994)
- lsh_bands b=20, r=1  : the reference probes each of the K min-values
                         independently against the index (rabin_dedup.c:1026-1036)
- simhash_bits  = 64   : 64-bit similarity keys (rabin/global/index.c:500-505)
- simhash_radius = 3   : hamming ball for "similar" blocks
- tau_normal / tau_extra = 0.6 / 0.4 : DELTA_NORMAL / DELTA_EXTRA similarity
                         thresholds (rabin/rabin_dedup.h:153-159, rabin_dedup.c:97-99)
- substring_min_len = 2048 : 1 << RAB_BLK_MIN_BITS(11) (rabin/rabin_dedup.h:88)
"""

from __future__ import annotations

from dataclasses import dataclass, field

_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def parse_size(value: str | int) -> int:
    """Parse a human-friendly size with optional k/m/g/t suffix, e.g.
    "8k" -> 8192, "2M" -> 2097152 (F13: the analog of the reference's
    `parse_numeric`, /root/reference/utils/utils.c:150-202 — binary
    multipliers, case-insensitive, bare integers pass through)."""
    if isinstance(value, int):
        return value
    s = value.strip().lower()
    if not s:
        raise ValueError("empty size string")
    mult = 1
    if s[-1] in _SUFFIX:
        mult = _SUFFIX[s[-1]]
        s = s[:-1]
    if not s.isdigit():
        raise ValueError(f"invalid size literal: {value!r}")
    return int(s) * mult


@dataclass(frozen=True)
class PipelineConfig:
    # --- signature config (mirrors the reference constants) ---
    shingle_width: int = 16          # characters per shingle
    minhash_k: int = 20              # number of minhash permutations
    lsh_bands: int = 20              # b
    lsh_rows: int = 1                # r (b*r == minhash_k)
    simhash_bits: int = 64
    simhash_radius: int = 3          # max hamming distance
    simhash_blocks: int = 4          # pigeonhole blocks (radius+1)
    tau_normal: float = 0.6          # DELTA_NORMAL verify threshold
    tau_extra: float = 0.4           # DELTA_EXTRA verify threshold
    substring_min_len: int = 2048    # min verbatim shared span (chars)
    min_doc_len: int = 32            # docs shorter than this skip fuzzy dedup
                                     # (analog of small-chunk filter,
                                     # rabin_dedup.c:500-510)
    cjk_shingle_chars: int = 8       # CJK shingle width in CODEPOINTS (P6
                                     # adaptive config): 16 BYTES spans only
                                     # ~5 Han chars in UTF-8, so zh/ja/ko
                                     # shingle in the codepoint domain
                                     # (functions/hashing.py shingles_for;
                                     # analog of adaptive_compress.c:325-430
                                     # per-content algorithm selection)

    # --- scale/skew knobs ---
    salt_buckets: int = 16           # salt groups g for the triangle split of
                                     # hot buckets (operators/pairs.py): a
                                     # bucket of m docs spreads its m²/2 pairs
                                     # over g(g+1)/2 join-key cells
    salt_min: int = 256              # buckets larger than this get salted.
                                     # bucket_pairs clamps it to
                                     # max_bucket_docs, so at the default
                                     # cap (64) the salted branch is empty
                                     # BY DESIGN: a <= 64-doc bucket emits
                                     # <= 2016 pairs in one key group —
                                     # salting it was measured as pure
                                     # replication overhead (16 copies of
                                     # every mid-bucket row through the
                                     # self-join) with zero skew benefit.
                                     # The mechanism stays for large-cap
                                     # configs where one bucket's m**2/2
                                     # really can swamp a task.
    max_bucket_docs: int = 64        # cap on docs per band bucket: larger
                                     # buckets star-join to their min doc
                                     # instead of all-pairs (measured at 100k
                                     # docs: cap 512 let the band buckets emit
                                     # 16.7M raw pairs of which prefilter +
                                     # degree cap kept 43.6k — a 500 MB
                                     # shuffle feeding a 99.7% discard, and
                                     # the memory-bandwidth hog that made the
                                     # three concurrent channels anti-scale at
                                     # 32 threads; star edges are
                                     # exact-verified so cluster connectivity
                                     # is unaffected). Drops are logged,
                                     # never silent (A7 bounded index,
                                     # rabin/global/index.c:539-547 analog)
    packed_bucket_keys: bool = True  # fused candidate path packs (ch, key)
                                     # into one long (channel in the low 2
                                     # bits) so every candidate-stage
                                     # exchange ships/sorts 1 key column
                                     # instead of 2; False = the unpacked
                                     # r3 layout (A/B lever)
    r_gt1_band_screen: bool = False  # library lever for DIRECT callers
                                     # of verify.prefilter_candidates at
                                     # r>1: keep pairs whose proven floor
                                     # band_hits*r >= min_matches without
                                     # shipping minhash arrays (kept set
                                     # provably identical — parity test).
                                     # The PIPELINE no longer runs the
                                     # signature prefilter at r>1 at all:
                                     # banding at r>1 is itself the
                                     # precision screen (junk collides
                                     # w.p. ~J^r per band) and the τ-gate
                                     # verify catches the residue —
                                     # measured r5 on 60k docs: screen-on
                                     # 98-118s, screen-off-with-prefilter
                                     # 78-102s, no-prefilter 48-50s for
                                     # the b=10/r=2 leg, recall gate 1.00
                                     # throughout.
    curation_gate: bool = False      # run the webtext keep/drop gate
                                     # (analysis/webtext.quality_gate)
                                     # ahead of signatures: rejected docs
                                     # never spend sketch budget; drops
                                     # logged by reason under the
                                     # checkpoint dir. Off by default —
                                     # dedup semantics (golden fixtures)
                                     # are defined over the full corpus.
    fused_channels: bool = True      # generate all three candidate channels
                                     # (minhash bands / simhash blocks /
                                     # winnow anchors) through ONE fused
                                     # bucket shuffle (operators/fused.py).
                                     # False = legacy per-channel jobs,
                                     # kept for A/B and fault isolation.
    concurrent_channels: bool | str = "auto"
                                     # legacy (fused_channels=False) path
                                     # only: run the three channel jobs
                                     # from worker threads. True = always
                                     # concurrent (the right default on a
                                     # multi-node cluster, where each
                                     # executor brings its own memory
                                     # bus); False = sequential; "auto" =
                                     # concurrent only when
                                     # defaultParallelism < 16 — a
                                     # SINGLE-BOX heuristic: on one
                                     # 16-physical-core SMT box, three
                                     # concurrent pandas-UDF jobs at 32
                                     # slots oversubscribe the memory bus
                                     # (measured 2-3x slowdown). Set
                                     # explicitly on real clusters.
    verify_degree_cap: int = 64      # max verified candidate neighbors per doc
                                     # (top-D by minhash overlap). A clique of m
                                     # boilerplate docs yields O(m*D) verified
                                     # edges instead of m^2/2 while staying one
                                     # connected cluster; drops are logged.
    shuffle_partitions: int = 32
    arrow_batch_rows: int = 2048     # arrow maxRecordsPerBatch for wide arrays

    # --- hashing seeds (deterministic, fixed) ---
    seed: int = 42
    # multiply-add minhash permutation parameters are derived from seed

    # --- substring fingerprinting (winnowing) ---
    substring_window: int = 64       # rolling-hash window (chars)
    substring_stride: int = 992      # sample stride; window+stride-1 <= min_len/2+...
                                     # guarantee: shared span >= window + stride - 1
                                     # in BOTH docs is caught; 64+992-1=1055 < 2048
                                     # with both-side anchor alignment (see substring.py)
    substring_screen_mode: str = "auto"
                                     # window-hash screen before the byte-
                                     # confirming UDF: "on" | "off" |
                                     # "auto" (screen only when
                                     # substring_min_len >= the ~1 KB
                                     # break-even — the screen arrays cost
                                     # ~8 bytes/char through two joins, so
                                     # for short-doc configs they exceed
                                     # the confirm they save; see
                                     # verify.confirm_substring_pairs)

    # --- verification ---
    verify_tau: float = 0.4          # emit edges with exact jaccard >= this;
                                     # `kind` column distinguishes >=0.6 vs >=0.4

    checkpoint_dir: str = "/tmp/pcompress_spark_ckpt"
    checkpoint_format: str = "parquet"  # "iceberg" on a real cluster

    def __post_init__(self) -> None:
        assert self.lsh_bands * self.lsh_rows == self.minhash_k, (
            "b*r must equal minhash K"
        )
        assert self.simhash_blocks >= self.simhash_radius + 1, (
            "pigeonhole needs radius+1 blocks"
        )
        assert self.substring_screen_mode in ("on", "off", "auto"), (
            "substring_screen_mode must be on/off/auto"
        )
        assert self.concurrent_channels in (True, False, "auto"), (
            "concurrent_channels must be True/False/'auto'"
        )

    def use_substring_screen(self) -> bool:
        """Resolve substring_screen_mode: screen iff it is cheaper than the
        byte-confirm it avoids (break-even ~1 KB min span, see
        verify.confirm_substring_pairs)."""
        if self.substring_screen_mode == "on":
            return True
        if self.substring_screen_mode == "off":
            return False
        return self.substring_min_len >= 1024

    # size-typed fields that accept "8k"/"2M"-style CLI literals
    _SIZE_FIELDS = frozenset(
        ("substring_min_len", "min_doc_len", "max_bucket_docs")
    )

    @classmethod
    def from_args(cls, **overrides) -> "PipelineConfig":
        """Build a config from CLI-style overrides; size-typed fields take
        k/m/g-suffixed strings (reference `-s`/`-B` flag parsing,
        utils/utils.c:150-202); other fields arriving as strings (e.g.
        from --conf-override FIELD=VALUE) are coerced to the declared
        field type, so `minhash_k=20` on the command line is the int 20,
        not the string "20"."""
        import dataclasses

        types = {f.name: f.type for f in dataclasses.fields(cls)}
        parsed: dict[str, object] = {}
        for k, v in overrides.items():
            if k in cls._SIZE_FIELDS:
                parsed[k] = parse_size(v)
            elif isinstance(v, str) and k in types:
                t = types[k]
                if t in ("int", int):
                    parsed[k] = int(v)
                elif t in ("float", float):
                    parsed[k] = float(v)
                elif t in ("bool", bool):
                    parsed[k] = _parse_bool(k, v)
                elif t == "bool | str":
                    # union fields (concurrent_channels): bool literals
                    # coerce, sentinels like "auto" pass through
                    low = v.lower()
                    parsed[k] = (
                        _parse_bool(k, v)
                        if low in _BOOL_WORDS
                        else v
                    )
                else:
                    parsed[k] = v
            else:
                parsed[k] = v
        return cls(**parsed)


_BOOL_WORDS = frozenset(
    ("1", "true", "yes", "on", "0", "false", "no", "off")
)


def _parse_bool(field: str, v: str) -> bool:
    """Strict bool parsing for CLI overrides — a typo must error, not
    silently become False (parse_size sets the precedent)."""
    low = v.lower()
    if low in ("1", "true", "yes", "on"):
        return True
    if low in ("0", "false", "no", "off"):
        return False
    raise ValueError(f"{field}: expected a boolean literal, got {v!r}")


DEFAULT_CONFIG = PipelineConfig()
