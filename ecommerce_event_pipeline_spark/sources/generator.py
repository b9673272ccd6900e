"""Distributed synthetic event generation (reference: scripts/generate_events.py).

The reference generates events in a single-process Python loop (~10⁴
events/day). This version is a Spark job: ``spark.range(users)`` →
per-user session explosion → per-session pattern explosion, with every
"random" choice a deterministic xxhash64 of (user, session, position) — so
any slice of any day regenerates identically on any executor, with no RNG
state and no driver loop. Generating 10⁹ events/day is then just a bigger
range.

Invariants preserved from the reference generator (they double as the data
contract for the quality checks, reference: tests/test_generate_events.py):
- funnel order within a session: page_view → click → add_to_cart →
  purchase prefixes only, plus optional search insertions;
- platform constant within a session; ios/android ⇒ mobile device;
- purchase carries extra_data JSON with a product line (qty 1–3),
  discount ∈ {0,1000,2000,3000,5000}, shipping 3000 below the 50k
  free-shipping threshold, and total_amount = Σ qty·price − discount +
  shipping exactly;
- timestamps strictly inside the target date, sessions time-sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 21-product catalog (product_id, name, price, category) — the dimension
#: the reference keeps in Python (reference: scripts/generate_events.py:38-60).
CATALOG = [
    ("P1001", "wireless earbuds", 89000.0, "CAT001"),
    ("P1002", "bluetooth speaker", 45000.0, "CAT001"),
    ("P1003", "smart watch", 199000.0, "CAT001"),
    ("P1004", "usb-c hub", 32000.0, "CAT001"),
    ("P1005", "mechanical keyboard", 120000.0, "CAT001"),
    ("P2001", "running shoes", 79000.0, "CAT002"),
    ("P2002", "training jacket", 55000.0, "CAT002"),
    ("P2003", "yoga mat", 25000.0, "CAT002"),
    ("P2004", "sports bottle", 12000.0, "CAT002"),
    ("P3001", "drip coffee set", 38000.0, "CAT003"),
    ("P3002", "air fryer", 99000.0, "CAT003"),
    ("P3003", "cast iron pan", 42000.0, "CAT003"),
    ("P3004", "knife set", 68000.0, "CAT003"),
    ("P4001", "moisturizing cream", 28000.0, "CAT004"),
    ("P4002", "sunscreen", 18000.0, "CAT004"),
    ("P4003", "shampoo set", 22000.0, "CAT004"),
    ("P4004", "perfume", 85000.0, "CAT004"),
    ("P5001", "novel bestseller", 15000.0, "CAT005"),
    ("P5002", "cookbook", 21000.0, "CAT005"),
    ("P5003", "notebook set", 9000.0, "CAT005"),
    ("P5004", "desk organizer", 17000.0, "CAT005"),
]

#: Valid session shapes (funnel prefixes + search variants).
PATTERNS = [
    ["page_view"],
    ["page_view", "click"],
    ["page_view", "search", "click"],
    ["page_view", "click", "add_to_cart"],
    ["page_view", "click", "add_to_cart", "purchase"],
    ["page_view", "search", "click", "add_to_cart", "purchase"],
    ["page_view", "click", "page_view", "click", "add_to_cart", "purchase"],
    ["search", "page_view", "click"],
]

PLATFORMS = ["web", "web", "ios", "android"]  # ~50/25/25
WEB_DEVICES = ["desktop", "desktop", "mobile", "tablet"]
PAGE_TYPES = ["home", "category", "product", "cart", "checkout"]
PAYMENT_METHODS = ["credit_card", "bank_transfer", "kakao_pay", "naver_pay", "toss_pay"]
DISCOUNTS = [0.0, 0.0, 0.0, 1000.0, 2000.0, 3000.0, 5000.0]


def _pick(h: F.Column, options: list, idx: int) -> F.Column:
    """Deterministic choice from a literal list using hash lane ``idx``."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.abs(F.xxhash64(h, F.lit(idx))) % len(options) + 1).cast("int"))


def generate_events(
    spark: SparkSession, ds: str, n_users: int = 500, seed: int = 42
) -> DataFrame:
    """One day of reference-shaped events as a DataFrame (EVENT_SCHEMA
    columns + derived ts/event_date/event_hour)."""
    catalog = F.array(
        *[
            F.struct(
                F.lit(p).alias("product_id"),
                F.lit(n).alias("name"),
                F.lit(pr).alias("price"),
                F.lit(c).alias("category_id"),
            )
            for p, n, pr, c in CATALOG
        ]
    )
    patterns = F.array(
        *[F.array(*[F.lit(s) for s in pat]) for pat in PATTERNS]
    )

    users = spark.range(n_users).select(
        F.format_string("U%06d", F.col("id")).alias("user_id"),
        F.xxhash64(F.col("id"), F.lit(ds), F.lit(seed)).alias("uh"),
    )
    # activity share varies by day of week — weekends busier, mirroring the
    # reference's weekday multipliers (reference: scripts/generate_events.py:81)
    dow = F.dayofweek(F.to_date(F.lit(ds)))  # 1=Sun … 7=Sat
    active_pct = F.when(dow.isin(1, 7), F.lit(65)).otherwise(F.lit(50))
    active = users.where(F.abs(F.col("uh")) % 100 < active_pct)
    sessions = active.select(
        "user_id",
        "uh",
        F.explode(
            F.sequence(F.lit(0), (F.abs(F.col("uh")) % 2).cast("int"))
        ).alias("session_no"),
    ).withColumn("sh", F.xxhash64(F.col("uh"), F.col("session_no")))

    with_pattern = sessions.select(
        "user_id",
        "sh",
        F.md5(F.col("sh").cast("string")).alias("session_id"),
        F.element_at(patterns, (F.abs(F.col("sh")) % len(PATTERNS) + 1).cast("int")).alias(
            "pattern"
        ),
        _pick(F.col("sh"), PLATFORMS, 1).alias("platform"),
        # session start hour drawn from a realistic daily curve (evening-
        # heavy, quiet 1–6 AM — reference: scripts/generate_events.py hour
        # weighting); minute/second uniform. The hour list is a weighted
        # sampling table: hour h appears once per unit of weight.
        (
            _pick(
                F.col("sh"),
                # 24 hours with weights: 0-6h low, 9-17h medium, 19-22h peak
                [0, 1, 2, 3, 4, 5, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12,
                 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18, 19,
                 19, 19, 20, 20, 20, 21, 21, 21, 22, 22, 23],
                2,
            )
            * 3600
            # intra-hour jitter capped at 3184 s: the longest pattern adds
            # 6×60 + 55 = 415 s, and 3184 + 415 = 3599 keeps every event
            # inside the start hour — and therefore inside the day even for
            # hour 23 (no clamping; clamping would create ties that break
            # the strict funnel ordering Q4 checks)
            + (F.abs(F.xxhash64(F.col("sh"), F.lit(14))) % 3185)
        ).alias("session_start_s"),
    )
    with_device = with_pattern.withColumn(
        "device_type",
        F.when(F.col("platform").isin("ios", "android"), F.lit("mobile")).otherwise(
            _pick(F.col("sh"), WEB_DEVICES, 3)
        ),
    ).withColumn(
        "os",
        F.when(F.col("platform") == "ios", F.lit("iOS"))
        .when(F.col("platform") == "android", F.lit("Android"))
        .otherwise(_pick(F.col("sh"), ["Windows", "macOS", "Linux"], 4)),
    )

    events = with_device.select(
        "*", F.posexplode("pattern").alias("event_no", "event_type")
    )
    eh = F.xxhash64(F.col("sh"), F.col("event_no"), F.lit("e"))
    # strictly monotonic within a session: fixed 60 s stride + 0–55 s
    # per-event jitter (jitter < stride − 1 ⇒ order can never invert)
    offset = F.col("session_start_s") + F.col("event_no") * 60 + F.abs(eh) % 56
    ts = F.to_timestamp(F.lit(ds)) + F.make_dt_interval(secs=offset.cast("double"))

    product = F.element_at(catalog, (F.abs(F.xxhash64(eh, F.lit(5))) % len(CATALOG) + 1).cast("int"))
    quantity = (F.abs(F.xxhash64(eh, F.lit(6))) % 3 + 1).cast("int")
    # purchase payload: 1–3 product lines (reference: 1–3 products per
    # purchase), each with qty 1–3; discount/shipping per reference rules
    n_items = (F.abs(F.xxhash64(eh, F.lit(15))) % 3 + 1).cast("int")
    items = F.transform(
        F.sequence(F.lit(1), n_items),
        lambda i: F.struct(
            F.element_at(
                catalog,
                (F.abs(F.xxhash64(eh, i)) % len(CATALOG) + 1).cast("int"),
            )["product_id"].alias("product_id"),
            (F.abs(F.xxhash64(eh, i, F.lit(16))) % 3 + 1).cast("int").alias("quantity"),
            F.element_at(
                catalog,
                (F.abs(F.xxhash64(eh, i)) % len(CATALOG) + 1).cast("int"),
            )["price"].alias("unit_price"),
        ),
    )
    items_total = F.aggregate(
        items,
        F.lit(0.0),
        lambda acc, x: acc + x["quantity"].cast("double") * x["unit_price"],
    )
    discount = _pick(eh, DISCOUNTS, 7)
    shipping = F.when(items_total >= 50000, F.lit(0.0)).otherwise(F.lit(3000.0))
    total_amount = items_total - discount + shipping
    extra_data = F.to_json(
        F.struct(
            items.alias("products"),
            discount.alias("discount_amount"),
            shipping.alias("shipping_fee"),
            F.when(discount > 0, F.concat(F.lit("COUP"), (F.abs(eh) % 900 + 100).cast("string"))).alias(
                "coupon_code"
            ),
        )
    )

    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    out = events.select(
        F.md5(eh.cast("string")).alias("event_id"),
        "event_type",
        "user_id",
        "session_id",
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        "platform",
        "device_type",
        "os",
        _pick(eh, ["Chrome", "Safari", "Firefox", "Edge"], 8).alias("browser"),
        F.when(
            is_type("page_view") | is_type("click") | is_type("search"),
            F.concat(F.lit("https://shop.example/"), _pick(eh, PAGE_TYPES, 9)),
        ).alias("page_url"),
        F.when(is_type("page_view"), _pick(eh, PAGE_TYPES, 9)).alias("page_type"),
        F.when(is_type("click"), F.concat(F.lit("el-"), (F.abs(eh) % 50).cast("string"))).alias(
            "element_id"
        ),
        F.when(is_type("click"), _pick(eh, ["button", "link", "banner", "product_card"], 10)).alias(
            "element_type"
        ),
        F.when(is_type("click") | is_type("add_to_cart"), product["product_id"]).alias(
            "product_id"
        ),
        F.when(is_type("click") | is_type("add_to_cart"), product["category_id"]).alias(
            "category_id"
        ),
        F.when(is_type("add_to_cart"), quantity).alias("quantity"),
        F.when(is_type("add_to_cart"), product["price"]).alias("unit_price"),
        F.when(is_type("purchase"), F.format_string("ORD%013d", F.abs(eh) % 10000000000000)).alias(
            "order_id"
        ),
        F.when(is_type("purchase"), total_amount).alias("total_amount"),
        F.when(is_type("purchase"), _pick(eh, PAYMENT_METHODS, 11)).alias("payment_method"),
        F.when(is_type("search"), _pick(eh, ["shoes", "coffee", "watch", "book"], 12)).alias(
            "search_query"
        ),
        F.when(is_type("search"), (F.abs(eh) % 50).cast("int")).alias("result_count"),
        F.when(F.abs(F.xxhash64(eh, F.lit(13))) % 2 == 0, F.lit("direct")).alias("referrer"),
        F.when(is_type("purchase"), extra_data).alias("extra_data"),
    )
    from .readers import with_time_columns

    return with_time_columns(out, "timestamp", is_string=True)
