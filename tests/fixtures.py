"""Reference-shaped test fixtures (FIXTURES.md §A): nested `events` rows and
the `geo` city dimension (with tz_name per SURVEY.md §7.5).

Scenario encoded (drives the pipeline assertions):
- user 1: long Moscow stay (>27 days) then St Petersburg -> home=Moscow,
  act=Saint Petersburg, travel [Moscow, Saint Petersburg];
- user 2: city-hopping short stays -> no home city, 3 travel legs;
- user 3: a single Kazan message -> act=Kazan, no home;
- one null-datetime row (must be dropped by every report);
- channel 100 subscribers: users 10+11 within ~550 m in Moscow (pair),
  user 12 ~7 km away in Moscow (no pair), user 13 in SPb (no pair);
  channel 200: users 10+13 (different cities -> no pair);
- reaction + subscription events to exercise the zone pivot.
"""

from __future__ import annotations

import pyspark.sql.types as T

GEO_ROWS = [
    (1, "Moscow", 55.7558, 37.6173, "Europe/Moscow"),
    (2, "Saint Petersburg", 59.9343, 30.3351, "Europe/Moscow"),
    (3, "Kazan", 55.7963, 49.1088, "Europe/Moscow"),
    (4, "Novosibirsk", 55.0084, 82.9357, "Asia/Novosibirsk"),
]

GEO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("lat_c", T.DoubleType(), False),
        T.StructField("lon_c", T.DoubleType(), False),
        T.StructField("tz_name", T.StringType(), False),
    ]
)

EVENT_STRUCT = T.StructType(
    [
        T.StructField("message_from", T.LongType(), True),
        T.StructField("message_to", T.LongType(), True),
        T.StructField("message_id", T.LongType(), True),
        T.StructField("datetime", T.StringType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("subscription_channel", T.LongType(), True),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event", EVENT_STRUCT, False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("date", T.StringType(), False),
    ]
)


def _msg(uid, day, hour, lat, lon, mid):
    dt = f"2024-01-{day:02d} {hour:02d}:00:00" if day <= 31 else f"2024-02-{day-31:02d} {hour:02d}:00:00"
    return ((uid, None, mid, dt, None, None), "message", lat, lon, dt[:10])


def _sub(uid, channel, lat, lon, mid, day=5):
    dt = f"2024-01-{day:02d} 09:00:00"
    return ((None, None, mid, dt, str(uid), channel), "subscription", lat, lon, dt[:10])


def _reaction(uid, day, lat, lon, mid):
    dt = f"2024-01-{day:02d} 12:00:00"
    return ((uid, None, mid, dt, None, None), "reaction", lat, lon, dt[:10])


# Near-Moscow coordinates for the recommendation radius tests.
MOSCOW = (55.7558, 37.6173)
MOSCOW_550M = (55.7558 + 0.005, 37.6173)        # ~556 m north
MOSCOW_7KM = (55.7558 + 0.065, 37.6173)         # ~7.2 km north
SPB = (59.9343, 30.3351)
NEAR_KAZAN = (55.80, 49.10)

EVENT_ROWS = [
    # user 1: Moscow 2024-01-01 .. 2024-02-10 (40 days) then SPb
    _msg(1, 1, 10, *MOSCOW, 101),
    _msg(1, 15, 10, 55.76, 37.62, 102),
    _msg(1, 40, 10, *MOSCOW, 103),          # 2024-02-09, still Moscow
    _msg(1, 41, 10, *SPB, 104),             # 2024-02-10 SPb
    _msg(1, 42, 10, *SPB, 105),
    # user 2: hops Moscow -> Kazan -> Moscow on consecutive days
    _msg(2, 1, 9, *MOSCOW, 201),
    _msg(2, 2, 9, *NEAR_KAZAN, 202),
    _msg(2, 3, 9, *MOSCOW, 203),
    # user 3: single Kazan message
    _msg(3, 10, 9, *NEAR_KAZAN, 301),
    # null datetime row (dropped everywhere)
    ((1, None, 999, None, None, None), "message", 55.75, 37.61, "2024-01-20"),
    # recommendation scenario: latest positions via messages
    _msg(10, 20, 9, *MOSCOW, 1001),
    _msg(11, 20, 10, *MOSCOW_550M, 1101),
    _msg(12, 20, 11, *MOSCOW_7KM, 1201),
    _msg(13, 20, 12, *SPB, 1301),
    # subscriptions
    _sub(10, 100, *MOSCOW, 2001),
    _sub(11, 100, *MOSCOW_550M, 2002),
    _sub(12, 100, *MOSCOW_7KM, 2003),
    _sub(13, 100, *SPB, 2004),
    _sub(10, 200, *MOSCOW, 2005),
    _sub(13, 200, *SPB, 2006),
    # reactions for the zone pivot
    _reaction(1, 5, *MOSCOW, 3001),
    _reaction(2, 6, *NEAR_KAZAN, 3002),
]


def make_events(spark):
    return spark.createDataFrame(EVENT_ROWS, EVENTS_SCHEMA)


def make_geo(spark):
    return spark.createDataFrame(GEO_ROWS, GEO_SCHEMA)
