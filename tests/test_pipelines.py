"""End-to-end pipeline tests on the reference-shaped fixtures
(tests/fixtures.py scenario; SURVEY.md §5 item 4).

Covers the four reference jobs with their bug fixes:
  geotag (save_mes_geo, B1 radians), user_city (calculate_user_city, B4/Q1),
  zone report (calculate_zone_report, Q2 grain), recommendations
  (calculate_user_recommendations, B2 reconstruction).
"""

import datetime

import pytest

from hadoop_data_lake_spark.pipelines.geotag import events_with_city
from hadoop_data_lake_spark.pipelines.recommendations import recommend_pairs
from hadoop_data_lake_spark.pipelines.user_city import user_city_datamart
from hadoop_data_lake_spark.pipelines.zone_report import zone_report_from_mes_geo
from tests.fixtures import make_events, make_geo


@pytest.fixture(scope="module")
def mes_geo(spark):
    df = events_with_city(make_events(spark), make_geo(spark)).cache()
    df.count()
    yield df
    df.unpersist()


def test_geotag_nearest_city(mes_geo):
    rows = mes_geo.where("event_type = 'message'").collect()
    by_mid = {r["event"]["message_id"]: r for r in rows}
    assert by_mid[101]["city_name"] == "Moscow"
    assert by_mid[104]["city_name"] == "Saint Petersburg"
    assert by_mid[202]["city_name"] == "Kazan"
    assert by_mid[301]["city_name"] == "Kazan"
    # distance to the chosen centroid is sane (city-scale, not B1-garbage)
    assert all(r["dist_km"] < 50 for r in rows)
    # exactly one city per input event
    assert mes_geo.count() == mes_geo.select("event_id").distinct().count()


def test_geotag_carries_tz(mes_geo):
    assert "tz_name" in mes_geo.columns
    tz = {r["city_name"]: r["tz_name"] for r in mes_geo.collect()}
    assert tz["Moscow"] == "Europe/Moscow"


def test_user_city_datamart_scenario(mes_geo):
    out = {r["user_id"]: r for r in user_city_datamart(mes_geo).collect()}

    # user 1: >27-day Moscow run then SPb => home=Moscow, act=SPb
    assert out[1]["act_city"] == "Saint Petersburg"
    assert out[1]["home_city"] == "Moscow"
    assert out[1]["travel_array"] == ["Moscow", "Saint Petersburg"]
    assert out[1]["travel_count"] == 2

    # user 2: three 1-day hops => no home, 3 legs, act = last city
    assert out[2]["act_city"] == "Moscow"
    assert out[2]["home_city"] is None
    assert out[2]["travel_array"] == ["Moscow", "Kazan", "Moscow"]

    # user 3: single Kazan message
    assert out[3]["act_city"] == "Kazan"
    assert out[3]["home_city"] is None
    assert out[3]["travel_count"] == 1

    # local time = UTC ts shifted by the act city's zone (Moscow = UTC+3)
    assert out[2]["local_time"] == datetime.datetime(2024, 1, 3, 12, 0)

    # the null-datetime row creates no user and breaks nothing
    assert set(out) == {1, 2, 3, 10, 11, 12, 13}


def test_zone_report_grain_and_totals(mes_geo):
    rep = zone_report_from_mes_geo(mes_geo)
    rows = rep.collect()
    # Q2 grain: one row per (week, month, zone)
    keys = [(r["week"], r["month"], r["zone_id"]) for r in rows]
    assert len(keys) == len(set(keys))

    # every message lands in exactly one (week, month, zone) cell: summing
    # the distinct per-(month, zone) totals must equal the 13 message events
    # with a parseable datetime (the null-datetime row is dropped)
    total_msgs = (
        rep.select("month", "zone_id", "month_message")
        .distinct()
        .groupBy()
        .sum("month_message")
        .collect()[0][0]
    )
    assert total_msgs == 13

    # registrations: each of the 7 distinct message users registers once;
    # subscription events have message_from NULL and group separately
    month_user_total = (
        rep.select("month", "zone_id", "month_user").distinct().groupBy().sum("month_user").collect()[0][0]
    )
    assert month_user_total >= 7


def test_recommendations_radius_and_dedup(mes_geo):
    out = recommend_pairs(mes_geo, radius_km=1.0, processed_date=datetime.date(2024, 2, 1))
    rows = out.collect()
    # only users 10+11 share channel 100, same city, within 1 km;
    # 12 is ~7 km away, 13 is in SPb; channel 200 members are cross-city
    assert [(r["user_left"], r["user_right"]) for r in rows] == [(10, 11)]
    r = rows[0]
    assert r["channel"] == 100
    assert 0.4 < r["dist_km"] < 0.7
    assert r["processed_dttm"] == datetime.date(2024, 2, 1)
    # Moscow local midnight of the processed date (UTC+3)
    assert r["local_time"] == datetime.datetime(2024, 2, 1, 3, 0)


def test_recommendations_radius_widens(mes_geo):
    out = recommend_pairs(mes_geo, radius_km=10.0)
    pairs = sorted((r["user_left"], r["user_right"]) for r in out.collect())
    # 7.2 km now qualifies: 12 pairs with both 10 and 11; 13 still cross-city
    assert pairs == [(10, 11), (10, 12), (11, 12)]
