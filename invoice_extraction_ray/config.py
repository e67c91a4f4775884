"""Shared, declarative configuration for the transcript-extraction engine.

This module holds the *constants* (regex pattern strings, thresholds, label
vocabularies, boilerplate rules, business-rule quirks) that BOTH the pure-Python
oracle (`invoice_extraction_ray.oracle`) and the Ray Data engine
(`invoice_extraction_ray.stages.*`) consume.  The two implementations share no
logic — only this config — so pytest equality between them is a meaningful check.

Semantics are the transcript-domain analogues of the reference invoice pipeline
(see SURVEY.md §7.1):

- boilerplate header/footer strip   <- layout regions, reference ocr.py:280-306
- key-value anchor regexes          <- field extractors, reference extractors.py:41-65
- consensus merge thresholds        <- OCR consensus,   reference ocr.py:134-179
- master-data lookup rules          <- validators,      reference validators.py:134-341
  (fuzzy >=0.90 entity match, exact code match, +/-5% numeric ranges — documented
   oracle semantics in reference sample_output/README.md:74-95)
- forced region_b present           <- forced stamp.present=True, validators.py:113-130
- confidence caps 97/95             <- reference confidence.py:36-41
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Normalization (reference preprocess.py:15-70 analogue).
# Applied in this exact order by both oracle and engine.  All regexes are
# written in the RE2-compatible subset (no lookaround) so the engine can run
# them through pyarrow.compute while the oracle uses Python `re`.
# ---------------------------------------------------------------------------

# (pattern, replacement) applied with re.sub / pc.replace_substring_regex
NORMALIZE_REGEX_STEPS: list[tuple[str, str]] = [
    (r"\r\n|\r", "\n"),                  # newline unification
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f]", ""),  # control chars except \n, \t
    (r"(?m)[ \t]+$", ""),                # per-line trailing whitespace
    (r"\n{3,}", "\n\n"),                 # collapse 3+ blank lines
]

# literal HTML entities decoded before the regex steps run
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
]

# ---------------------------------------------------------------------------
# Boilerplate strip (reference _detect_layout_regions, ocr.py:280-306).
# Header = first HEADER_FRAC of lines, footer = last FOOTER_FRAC; body always
# kept.  Within header/footer, lines matching these patterns are dropped.
# ---------------------------------------------------------------------------

HEADER_FRAC = 0.20
FOOTER_FRAC = 0.15

GREETING_RE = r"(?i)^(hi|hello|dear|greetings|hey)\b"
SIGNOFF_RE = r"(?i)^(regards|best regards|warm regards|thanks|thank you|sincerely|cheers)[,.!]?\s*$"
DISCLAIMER_RE = r"(?i)(confidential|do not distribute|disclaimer|auto-generated)"
SEPARATOR_RE = r"^[-_=*]{3,}\s*$"
# a short line directly after a dropped signoff line (signature name) is dropped too
SIGNATURE_MAX_LEN = 40

# ---------------------------------------------------------------------------
# Span detectors (reference extractors.py:94-311 analogues).
# Each entry: (label, pattern, confidence, method).  Group 1 = value.
# Detector priority for consensus tie-breaks is METHOD_PRIORITY below.
# ---------------------------------------------------------------------------

ANCHOR_PATTERNS: list[tuple[str, str, float, str]] = [
    ("entity", r"(?im)^[> \t]*(?:dealer|vendor|supplier|agent)\s*[:=]\s*([A-Za-z][A-Za-z0-9 &.'\-]{2,60}?)\s*$",
     0.80, "anchor_regex"),
    ("code", r"(?i)(?:model|code|sku|part)\s*[:=]\s*([A-Z]{2,4}[ \-]?\d{3,5}[A-Z]?)\b",
     0.85, "anchor_regex"),
    ("code", r"\b([A-Z]{2,4}-\d{3,5}[A-Z]?)\b",
     0.75, "pattern"),
    ("power", r"(?i)\b(\d{1,3}(?:\.\d+)?)\s*(?:hp|kw)\b",
     0.90, "unit_regex"),
    ("amount", r"(?i)(?:total|amount|cost|price)\s*[:=]?\s*(?:₹|rs\.?|inr|\$)?\s*(\d[\d,]*(?:\.\d+)?)\b",
     0.90, "label_regex"),
    ("amount", r"(?:₹|\$)\s*(\d[\d,]*(?:\.\d+)?)\b",
     0.70, "currency"),
]

# heuristic second-pass detectors (reference's spaCy-NER / TitleCase-in-header
# fallbacks, extractors.py:111-135): applied per line, only when the line has a
# keyword but NO ':'/'=' anchor (those are covered by ANCHOR_PATTERNS).
HEURISTIC_ENTITY_KEYWORD_RE = r"(?i)\b(dealer|vendor|supplier)\b"
HEURISTIC_TITLECASE_RE = r"\b((?:[A-Z][a-z]+ )+[A-Z][a-z]+)\b"
HEURISTIC_ENTITY_CONF = 0.65
HEURISTIC_POWER_RE = r"(?i)\bpower\b\D{0,20}?(\d{1,3}(?:\.\d+)?)\b"
HEURISTIC_POWER_CONF = 0.75

# MIDDLE entity strategy (the reference's spaCy ORG-NER over header text at
# conf .75, extractors.py:115-125): deterministic NER analogue — an org-suffix
# gazetteer over capitalized phrases, applied to HEADER-ZONE lines only
# (i < ceil(HEADER_FRAC*n)), confidence tier between the anchor regex (.80)
# and the TitleCase heuristic (.65).
NER_ORG_SUFFIXES = (
    "Ltd", "Inc", "Corp", "LLC", "Motors", "Industries",
    "Traders", "Enterprises", "Automotive", "Agencies",
)
NER_ORG_RE = (
    r"\b((?:[A-Z][A-Za-z0-9&.']*\s+){1,4}(?:" + "|".join(NER_ORG_SUFFIXES) + r"))\b"
)
NER_ENTITY_CONF = 0.75

# detector priority when merging (reference prefer-easyocr tiebreak, ocr.py:215-233)
METHOD_PRIORITY: dict[str, int] = {
    "anchor_regex": 0,
    "label_regex": 1,
    "unit_regex": 2,
    "pattern": 3,
    "currency": 4,
    "proximity": 5,
    "heuristic": 6,
    "ner": 7,
    "fence": 0,
    "grid": 1,
    "quote": 2,
    "json": 0,
    "json_recovered": 1,
}

# ---------------------------------------------------------------------------
# Region detection (reference vision.py:44-110, extractors.py:313-331 analogues)
# ---------------------------------------------------------------------------

REGION_CODE_CONF = 0.95      # ``` fenced block
REGION_TABLE_CONF = 0.85     # pipe-grid block (table/line-item segmentation)
REGION_QUOTE_CONF = 0.80     # quoted-reply chain
REGION_JSON_CONF = 0.90      # valid JSON tool payload
REGION_JSON_RECOVERED_CONF = 0.60
TABLE_MIN_PIPES = 2          # a table line has >= 2 '|'
TABLE_MIN_LINES = 2
# smart-quote cleanup for JSON recovery (reference extractor.py:153-165)
JSON_RECOVERY_TRANS = {
    "‘": "'", "’": "'", "“": '"', "”": '"', "`": '"',
}

# ---------------------------------------------------------------------------
# Consensus merge (reference ocr.py:134-233 analogue)
# ---------------------------------------------------------------------------

MERGE_IOU_THRESHOLD = 0.5      # interval IoU on [start,end)
MERGE_TEXT_SIM_THRESHOLD = 0.8  # difflib ratio on lowercased values
CONF_ROUND_DECIMALS = 4

# ---------------------------------------------------------------------------
# Validation / master-data lookups (reference validators.py semantics)
# ---------------------------------------------------------------------------

FUZZY_ENTITY_THRESHOLD = 0.90       # validators.py:134-163 (>=90 ratio)
ENTITY_BLOCKLIST = {"do not reply", "internal use", "system notice"}
CODE_MIN_LEN, CODE_MAX_LEN = 2, 20  # validators.py:71-75 analogue
POWER_GLOBAL_RANGE = (10.0, 500.0)  # validators.py:77-88 / 202-238
AMOUNT_GLOBAL_RANGE = (100.0, 100_000_000.0)  # validators.py:90-98 / 240-276
RANGE_TOLERANCE = 0.05              # +/-5% model-specific tolerance

# forced-present business rule (reference validators.py:113-130: stamp always
# present).  region_b (table region) is always reported present.
FORCE_REGION_B_PRESENT = True

# ---------------------------------------------------------------------------
# Confidence scoring (reference confidence.py:6-73)
# ---------------------------------------------------------------------------

FIELD_ORDER = ["entity", "code", "power", "amount", "region_a", "region_b"]
CONF_CAP_ALL = 97    # 6/6 fields -> 97
CONF_CAP_MOST = 95   # >=5/6 -> 95
NOTES_ALL = "All fields extracted successfully."
NOTES_MISSING_FMT = "Missing fields: {missing}. Extraction partially successful."

# ---------------------------------------------------------------------------
# Output schema (FIXTURES.md F3)
# ---------------------------------------------------------------------------


def span_type():
    import pyarrow as pa

    return pa.list_(
        pa.struct(
            [
                ("label", pa.string()),
                ("start", pa.int32()),
                ("end", pa.int32()),
                ("value", pa.string()),
                ("conf", pa.float32()),
                ("method", pa.string()),
            ]
        )
    )


def fields_type():
    import pyarrow as pa

    region = pa.struct([("present", pa.bool_()), ("span", pa.list_(pa.int32()))])
    return pa.struct(
        [
            ("entity", pa.string()),
            ("code", pa.string()),
            ("power", pa.float64()),
            ("amount", pa.float64()),
            ("region_a", region),
            ("region_b", region),
        ]
    )


def output_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("extracted_text", pa.string()),
            ("spans", span_type()),
            ("fields", fields_type()),
            ("confidence", pa.float32()),
            ("notes", pa.string()),
        ]
    )


def input_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )


# --- consensus stage: cross-field consistency + weighted doc confidence +
#     anomaly detection (reference consensus.py:64-194 E16/A6, 224-255 E17).
#     Shared verbatim by stages/consensus.py (vectorized) and oracle.py. ---

CONSENSUS_AMOUNT_PER_POWER_MIN = 1000.0   # power*1000 <= amount  (ref hp*1000)
CONSENSUS_AMOUNT_PER_POWER_MAX = 10000.0  # amount <= power*10000
CONSENSUS_BOOST_RATIO_OK = 0.05
CONSENSUS_PENALTY_RATIO_BAD = -0.05
CONSENSUS_AMOUNT_FLOOR_PER_POWER = 50.0   # amount > power*50 (ref cost>hp*50)
CONSENSUS_BOOST_FLOOR_OK = 0.02
CONSENSUS_CODE_MIN_LEN = 3                # ref: model alnum & len 3-20
CONSENSUS_CODE_MAX_LEN = 20
CONSENSUS_BOOST_CODE_OK = 0.03
CONSENSUS_BOOST_BOTH_REGIONS = 0.02       # ref sig/stamp correlation
# A6 weights: field confidence, mean span confidence, region score, 0.5+boosts
CONSENSUS_WEIGHTS = (0.6, 0.2, 0.1, 0.1)
CONSENSUS_ROUND_DECIMALS = 4

# E17 anomaly predicates (ref consensus.py:224-255)
ANOMALY_POWER_RANGE = (5.0, 1000.0)
ANOMALY_AMOUNT_RANGE = (10.0, 50_000_000.0)
ANOMALY_SEP = "; "
ANOMALY_MISSING_CRITICAL = "missing_critical_fields"
ANOMALY_POWER = "power_out_of_range"
ANOMALY_AMOUNT = "amount_out_of_range"
ANOMALY_NO_REGIONS = "no_regions_detected"

# --- sketch defaults shared by ops/sketch.py and the __ray_entry__ oracle
#     SQL (CLAUDE.md rule: engine/oracle-shared semantics live HERE).
#     Changing any of these re-syncs both sides automatically. ---

KMV_K = 64                        # k-minimum-values sketch size
KMV_JACCARD_TYPES = ("click", "purchase")  # default event-type pair

# Max dimension rows the star-join family may collect driver-side and
# ray.put broadcast.  Past this, brand/nation/segment/Q17-style queries
# auto-dispatch to their join-free shard message-passing fallback (the
# unigram_surprisal vocab-cap pattern) so nothing corpus-scaled ever
# lands on the driver.  ~5M rows x 2 int64 cols ~ 80 MB broadcast.
BROADCAST_DIM_MAX_ROWS = 5_000_000

# served_labels stub-model semantics shared by stages/inference.py and the
# __ray_entry__ oracle SQL (whitespace token count == str.split() == RE2
# \S+, the repo's oracle-verified tokenizer).
SERVED_LONG_MIN_TOKENS = 40   # label = 'long' iff n_tokens >= this
SERVED_FAIL_MOD = 13          # n_tokens % this == 0 -> simulated failure
SERVED_FAIL_CODE = "http_500"
# sample size for the KMV join-cardinality estimator
# (ops/sketch.py::join_size_estimate and its oracle SQL).
JOIN_EST_K = 256

# snapshot_diff's deterministic "v2" derivation of the documents table
# (ops/dedup.py::snapshot_diff and its oracle SQL): drop every REMOVED_MOD-th
# doc, uppercase every CHANGED_MOD-th, add a new doc (id + ADDED_OFFSET,
# 'added:'-prefixed text) for every ADDED_MOD-th.
SNAPSHOT_REMOVED_MOD = 13
SNAPSHOT_CHANGED_MOD = 7
SNAPSHOT_ADDED_MOD = 11
SNAPSHOT_ADDED_OFFSET = 50_000_000

# served_rewards stub: reward = token density (tokens per char) as e4
# fixed point, floor((SCALE * n_tokens) / (n_chars + 1)) — exact integers
# on both engines.
SERVED_REWARD_SCALE = 10_000

# k-anonymity group-privacy gate (ops/curate.py::kanon_suppress and its
# oracle SQL): suppress documents whose (lang, source) group is smaller.
KANON_MIN_GROUP = 8

# tile count for the distributed global-rank window op
# (ops/window.py::user_value_ntile) and its NTILE(...) oracle SQL.
NTILE_N = 10

# GROUP BY + HAVING threshold for the Q18-style large-order query
# (ops/relational.py::large_order_customers and its oracle SQL): keep
# orders whose total lineitem quantity reaches this many units.
LARGE_ORDER_MIN_QTY = 250

# probe-side filter for the row-level EXISTS semijoin
# (ops/relational.py::order_lineitem_semi and its oracle SQL): an order
# qualifies iff it has at least one lineitem with this return flag.
SEMI_JOIN_RETURNFLAG = "R"

# incremental aggregate maintenance (ops/relational.py::
# incremental_user_value): events in the trailing this-many observed days
# are the "hot delta" rescanned per refresh; older days are served from the
# cached base-partial layout.  The refreshed result is cutoff-invariant
# (base + delta partials merge to the full GROUP BY), so the oracle is the
# plain full recompute and cannot desync from this knob.
INCREMENTAL_DELTA_DAYS = 7

# z-order scan window (ops/relational.py::events_zorder_scan and its oracle
# SQL): the 2-D predicate rectangle — user ids in [LO, HI], days in
# [max_day - BACK_LO, max_day - BACK_HI].  Shared so engine and gate can
# never desync on the probe rectangle.
ZORDER_USER_LO = 4
ZORDER_USER_HI = 11
ZORDER_DAY_BACK_LO = 9
ZORDER_DAY_BACK_HI = 3

# BFS traversal (ops/graph.py::bfs_hops and its WITH RECURSIVE oracle):
# seed part key and the hop budget.  Shared so engine and gate agree on
# the traversal frontier exactly.
BFS_SOURCE_PART = 1
BFS_MAX_HOPS = 4

# numeric band join (ops/relational.py::value_band_pairs and its oracle
# SQL): pair same-user events of the two types whose cent values differ by
# at most BAND_EPS_C.  Users with more than BAND_MAX_PER_SIDE events of a
# side are dropped BEFORE expansion (the quadratic-fanout cap, mirrored in
# the oracle's HAVING) so one hot user can never emit an unbounded pair
# shard.  Shared here so engine and gate can never desync.
BAND_TYPES = ("click", "purchase")
BAND_EPS_C = 100          # |click_cents - purchase_cents| <= $1.00
BAND_MAX_PER_SIDE = 256

# TPC-H Q21's exactly-one-witness shape (ops/relational.py::
# sole_return_suppliers and its oracle SQL): credit the single supplier
# holding the only returned lineitem on a multi-supplier order; report the
# top-K suppliers by credited-order count.  Flag shared with the semijoin.
SOLE_RETURN_TOPK = 20

# exact phrase retrieval (ops/text.py::phrase_search and its oracle SQL):
# the query phrase, matched on whitespace tokens with every (overlapping)
# occurrence counted.  Shared so engine and gate can never desync.
PHRASE_TERMS = ("big", "order", "scan")

# two-sample Kolmogorov-Smirnov drift audit (ops/sketch.py::value_ks_drift
# and its oracle SQL): the two event-type value distributions compared.
# Shared so engine and gate can never desync.
KS_EVENT_TYPES = ("click", "error")

# TPC-H Q7 analogue (ops/relational.py::nation_trade_flows and its oracle
# SQL): bilateral trade-flow report between two nations by ship year.
# Names + the half-open shipdate window are shared so engine and gate can
# never desync.
Q7_NATIONS = ("NATION_3", "NATION_7")
Q7_SHIP_LO = "1997-01-01"
Q7_SHIP_HI = "1999-01-01"

# TPC-H Q15 analogue (ops/relational.py::top_supplier_revenue): global
# argmax-with-ties over per-supplier revenue inside one ship quarter.
Q15_SHIP_LO = "1997-04-01"
Q15_SHIP_HI = "1997-07-01"

# TPC-H Q14 analogue (ops/relational.py::promo_revenue_share): promo-type
# revenue share (e6 fixed point) inside one ship month.
Q14_SHIP_LO = "1997-09-01"
Q14_SHIP_HI = "1997-10-01"
Q14_PROMO_TYPE = "PROMO"

# TPC-H Q19 analogue (ops/relational.py::disjunctive_revenue): OR-of-ANDs
# (brand, size band, quantity band) clauses — revenue of lineitems whose
# part satisfies ANY clause.  Tuples are (brand, size_lo, size_hi, qty_lo,
# qty_hi); all bounds inclusive.
Q19_CLAUSES = (
    ("Brand#13", 1, 15, 1, 11),
    ("Brand#22", 10, 30, 10, 20),
    ("Brand#25", 25, 50, 20, 30),
)

# TPC-H Q10 analogue (ops/relational.py::returned_item_report): top-K
# customers by revenue of RETURNED lineitems whose order sits in a
# one-quarter window.  Flag shared with the semijoin family.
Q10_ORDER_LO = "1997-07-01"
Q10_ORDER_HI = "1997-10-01"
Q10_TOPK = 20

# TPC-H Q8 analogue (ops/relational.py::market_share): the target supplier
# nation's e6 revenue share per ship year, restricted to orders from
# customers in the target region and to parts of the target type — the
# registry's deepest dimension chain (part, supplier, orders, customer,
# nation, region all participate).
Q8_NATION = "NATION_3"
Q8_REGION = "AMERICA"
Q8_PART_TYPE = "STANDARD"
Q8_SHIP_LO = "1997-01-01"
Q8_SHIP_HI = "1999-01-01"

# TPC-H Q11 analogue (ops/relational.py::value_concentration): suppliers
# whose total lineitem value exceeds FRACTION_PPM parts-per-million of the
# global total — the group-vs-global-fraction HAVING.  The threshold
# compares by integer cross-multiplication (value*1e6 > ppm*total), so
# engine and gate can never diverge on rounding.
Q11_FRACTION_PPM = 1000

# RANK()-with-ties top-N per group (ops/relational.py::segment_top_orders):
# the K used by the bounded distinct-value census and the oracle QUALIFY.
SEGMENT_TOP_K = 5

# TPC-H Q6 analogue (ops/relational.py::discounted_revenue): the
# forecast-revenue-change scan.  Discount band compared in e4 fixed point
# (floor(l_discount*1e4 + 0.5)) in BOTH engines; qty bound is strict <.
Q6_SHIP_LO = "1997-01-01"
Q6_SHIP_HI = "1998-01-01"
Q6_DISC_LO_E4 = 400
Q6_DISC_HI_E4 = 600
Q6_QTY_MAX = 24

# TPC-H Q4 analogue (ops/relational.py::late_shipment_orders): orders in
# the window having >= 1 lineitem shipped more than Q4_LATE_DAYS after the
# order date — the cross-side-predicate EXISTS (compares columns from BOTH
# join sides, so nothing can be pushed into either read).
Q4_ORDER_LO = "1997-01-01"
Q4_ORDER_HI = "1997-07-01"
Q4_LATE_DAYS = 60

# TPC-H Q9 analogue (ops/relational.py::nation_profit): profit per
# (supplier nation, ship year) over parts whose name contains the token;
# p_retailprice is the unit-cost proxy (the testdata has no partsupp), so
# amount_i = rev_i - qty * retail_cents * 10000 (both in cents*e4 units).
Q9_PART_TOKEN = "widget"

# TPC-H Q20 analogue (ops/relational.py::dominant_part_suppliers):
# suppliers shipping MORE THAN Q20_SHARE_PCT percent of some token-matched
# part's total shipped quantity (integer cross-multiplication:
# 100*q > pct*total).
Q20_PART_TOKEN = "bolt"
Q20_SHARE_PCT = 15

# TPC-H Q12 analogue (ops/relational.py::tax_band_priority): per tax band
# (e4 fixed point, the testdata's shipmode stand-in), how many lineitems
# belong to high-priority vs other orders.  Band and the priority split
# are shared with the oracle.
Q12_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")

# Edit-distance near-dup verify (ops/dedup.py::editdist_neardup and its
# levenshtein() oracle SQL): SNM window pairs are verified by exact BYTE
# Levenshtein over the first EDITDIST_PREFIX normalized characters
# (DuckDB's levenshtein counts bytes, so the engine DP runs over UTF-8
# bytes of the same slice); pairs with distance <= EDITDIST_MAX survive.
EDITDIST_PREFIX = 64
EDITDIST_MAX = 40
SNM_WINDOW = 4      # sorted-neighborhood window (ranks)
SNM_KEY_LEN = 16    # normalized-prefix blocking key length (chars)

# CDC changelog apply (ops/dedup.py::apply_changelog): the deterministic
# changelog derived from the base documents table — seq 1 deletes every
# CDC_DEL_MOD-th doc, seq 2 upserts ('upd:'+text) every CDC_UPD_MOD-th
# (resurrecting ids divisible by both — last writer wins), seq 3 deletes
# every CDC_DEL2_MOD-th (update-then-delete), seq 4 inserts a new doc
# (id + CDC_INS_OFFSET, 'ins:'+text) for every CDC_INS_MOD-th.  Shared
# with the oracle SQL.  The mods are chosen so every lifecycle class is
# NON-EMPTY: ids % 18 == 0 (and not % 15) are deleted then resurrected by
# the later upsert; ids % 30 == 0 are updated then deleted.
CDC_DEL_MOD = 9
CDC_UPD_MOD = 6
CDC_DEL2_MOD = 15
CDC_INS_MOD = 17
CDC_INS_OFFSET = 90_000_000

# Activity-span coverage (ops/interval.py::user_active_spans): each event
# opens an interval [ts, ts + gap) whose length depends on the event type;
# overlapping-or-touching intervals of one user merge into spans.  Shared
# with the oracle SQL's CASE expression.
SPAN_GAP_BY_TYPE = {"view": 600, "click": 1800, "purchase": 3600}
SPAN_GAP_DEFAULT = 900

# SCD Type-2 dimension build (ops/window.py::scd2_user_bands): a user's
# daily cents total maps to band 0/1/2 by these edges; consecutive
# observed days with the same band collapse into one validity version.
SCD2_BAND_EDGES_C = (5000, 15000)

# Grouped token census (ops/text.py::top_tokens_per_lang): top-K tokens per
# language by exact count, ties broken token-ascending (shared with the
# oracle's ROW_NUMBER ORDER BY n DESC, token).
TOPTOK_K = 10

# Rolling exact median (ops/window.py::rolling_median_value): per-user
# moving ROWS frame width (current row + ROLLMED_WINDOW-1 preceding); the
# output is 2x the median in cents so even-width prefixes stay integers.
ROLLMED_WINDOW = 7

# Bitemporal point-in-time query (ops/window.py::user_bands_asof): the
# epoch day whose valid version is selected from the SCD2 dimension.
# Chosen inside the testdata's ~30-day window so all three version states
# (open, closed-before, closed-after) occur.
SCD2_ASOF_DAY = 19_735
