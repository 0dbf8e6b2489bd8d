from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalakeingestion_spark.config.control import CONTROL_SCHEMA, next_ingestion_id
from datalakeingestion_spark.config.discovery import discover_tables, merge_control
from datalakeingestion_spark.ingest.watermark import STATUS_SUCCESS
from datalakeingestion_spark.runner import _expr_cols, run_groups
from datalakeingestion_spark.sources.fixtures import load_table

from .conftest import SF_SMALL

INFO_COLS = ["table_name", "column_name", "data_type", "column_key", "extra"]


@pytest.fixture()
def info_schema(spark):
    rows = [
        # orders_t: created+modified+auto-inc id+PK → coalesce expr, time partition
        ("orders_t", "id", "bigint", "PRI", "auto_increment"),
        ("orders_t", "created_datetime", "datetime", "", ""),
        ("orders_t", "modified_datetime", "datetime", "", ""),
        ("orders_t", "status", "varchar", "", ""),
        # seq_t: only auto-inc → integer watermark, 1M partition
        ("seq_t", "seq_id", "bigint", "PRI", "auto_increment"),
        ("seq_t", "name", "varchar", "", ""),
        # nokey_t: nothing usable → inactive
        ("nokey_t", "a", "varchar", "", ""),
        # already_t: already in control → excluded
        ("already_t", "created_datetime", "datetime", "", ""),
    ]
    return spark.createDataFrame(rows, INFO_COLS)


@pytest.fixture()
def existing(spark):
    row = (
        3, "mysql-table", "srv", "db1", "already_t", "created_datetime", "",
        0, 1, "NULL", "c", "g", "s3", "/lake/db1/already_t", "id",
        "vdb", "already_t_lv", 1, "()", "dag_db1", "2024-01-01",
    )
    return spark.createDataFrame([row], CONTROL_SCHEMA)


@pytest.mark.smoke
def test_discovery_rules(spark, info_schema, existing):
    new = discover_tables(spark, info_schema, existing, "db1").collect()
    by_name = {r["tablename"]: r for r in new}
    assert set(by_name) == {"orders_t", "seq_t", "nokey_t"}  # anti-join excluded already_t

    o = by_name["orders_t"]
    assert o["delta_field"] == "created_datetime"
    assert o["delta_field_expr"] == "coalesce(modified_datetime, created_datetime)"
    assert o["date_not_available"] == 0
    assert o["primary_key"] == "id"
    assert o["view_needed"] == 1
    assert "time-based" in o["partition_config"]
    assert o["active_indicator"] == 1

    s = by_name["seq_t"]
    assert s["delta_field"] == "seq_id"
    assert s["date_not_available"] == 1
    assert "non-time-based" in s["partition_config"]

    n = by_name["nokey_t"]
    assert n["active_indicator"] == 0 and n["delta_field"] == ""

    # ids continue from max existing + 1, deterministic order
    ids = sorted(r["lake_ingestion_id"] for r in new)
    assert ids == [4, 5, 6]

    merged = merge_control(existing, discover_tables(spark, info_schema, existing, "db1"))
    assert merged.count() == 4
    assert next_ingestion_id(merged) == 7

    # discovered partition_config round-trips through the parser
    from datalakeingestion_spark.config.partition_spec import parse_partition_config

    # reference parity: time-based discovery defaults to daily buckets
    # (update_config.py:176-222 → 'YYYYMMDD')
    assert parse_partition_config(o["partition_config"]).fmt == "YYYYMMDD"
    assert parse_partition_config(s["partition_config"]).fmt == "1M"


def test_expr_cols_parsing():
    assert _expr_cols("coalesce(modified_datetime, created_datetime)") == (
        "modified_datetime",
        "created_datetime",
    )
    assert _expr_cols("") == () and _expr_cols(None) == ()
    with pytest.raises(ValueError):
        _expr_cols("greatest(a,b)")


def test_run_groups_end_to_end(spark, tmp_path):
    # two parquet-backed "tables" driven purely by control rows
    events = load_table(spark, SF_SMALL, "events")
    src_a = str(tmp_path / "src_a")
    src_b = str(tmp_path / "src_b")
    events.write.parquet(src_a)
    # seq_id starts at 1: the integer-watermark epoch is 1 (reference
    # semantics — MySQL auto-increment), so an id=0 row would be excluded
    events.selectExpr("event_id + 1 AS seq_id", "value").write.parquet(src_b)

    mk = lambda rid, src, tbl, delta, int_wm, part, group: (
        rid, "parquet-table", src, "db1", tbl, delta, "", int_wm, 1, "NULL",
        "c", "g", "s3", str(tmp_path / "lake" / tbl), "user_id" if tbl == "ev" else "",
        "vdb", f"{tbl}_lv", 1 if tbl == "ev" else 0, part, group, "2024-01-01",
    )
    control = spark.createDataFrame(
        [
            mk(1, src_a, "ev", "ts", 0,
               "({'partition_seq_no': 1, 'partition_column_type': 'time-based', "
               "'partition_column': 'ts', 'partition_format': 'YYYYMM'},)", "dag_a"),
            mk(2, src_b, "seq", "seq_id", 1, "()", "dag_a"),
            mk(3, src_a, "skip_inactive", "ts", 0, "()", "dag_b"),
        ],
        CONTROL_SCHEMA,
    )

    report = run_groups(
        spark, control, str(tmp_path / "state"), groups=["dag_a"],
        max_parallel_tables=2,
    )
    assert sorted(report.results) == [1, 2]  # dag_b filtered out
    assert report.succeeded == [1, 2]
    assert spark.read.parquet(str(tmp_path / "lake" / "ev")).count() == events.count()
    assert spark.read.parquet(str(tmp_path / "lake" / "seq")).count() == events.count()
    # view registered for the view_needed table
    assert spark.sql("SELECT count(*) FROM ev_lv").first()[0] == 15

    # re-run: incremental no-data, still successful overall exit semantics
    report2 = run_groups(spark, control, str(tmp_path / "state"), groups=["dag_a"])
    assert all(r.status == "no-data-to-load" for r in report2.results.values())


def test_run_groups_isolates_failures(spark, tmp_path):
    bad = (
        7, "parquet-table", str(tmp_path / "missing"), "db1", "bad", "ts", "",
        0, 1, "NULL", "c", "g", "s3", str(tmp_path / "lake" / "bad"), "",
        "vdb", "bad_lv", 0, "()", "dag_x", "2024-01-01",
    )
    control = spark.createDataFrame([bad], CONTROL_SCHEMA)
    report = run_groups(spark, control, str(tmp_path / "state"), groups=["dag_x"])
    assert report.results[7].status == "failed"
    # failure recorded in the state table
    from datalakeingestion_spark.ingest.watermark import ExecutionLog

    log = ExecutionLog(spark, str(tmp_path / "state"))
    assert log.latest_entry(7, "failed") is not None


def test_sql_session_api(spark, tmp_path):
    from datalakeingestion_spark.api import open_session

    s = open_session("/root/testdata/sf0.001", spark=spark)
    n = s.sql(
        "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).first()[0]
    # every lineitem row has a parent order → join preserves cardinality
    assert n == s.sql("SELECT count(*) FROM lineitem").first()[0] > 0
    assert s.sql("SELECT count(*) FROM documents").first()[0] > 0


def test_default_resolver_dispatch(spark, tmp_path):
    import pytest as _pytest
    from pyspark import Row as _Row  # noqa: F401
    from datalakeingestion_spark.runner import default_source_resolver

    events = load_table(spark, SF_SMALL, "events").limit(20)
    pq = str(tmp_path / "pq"); events.write.parquet(pq)
    cv = str(tmp_path / "cv")
    events.select("event_id", "event_type").write.option("header", True).csv(cv)

    mkrow = lambda itype, src: spark.createDataFrame(
        [(itype, src, "db", "t", "ts")],
        ["ingestion_type", "servername", "databasename", "tablename", "delta_field"],
    ).first()
    assert default_source_resolver(spark, mkrow("parquet-table", pq)).count() == 20
    assert default_source_resolver(spark, mkrow("csv-file", cv)).count() == 20
    # xlsx-file dispatches through the stdlib SpreadsheetML reader now
    from datalakeingestion_spark.config.xlsx import write_xlsx

    xl = str(tmp_path / "t.xlsx")
    write_xlsx(xl, ["a", "b"], [[1, "x"], [2, "y"]])
    assert default_source_resolver(spark, mkrow("xlsx-file", xl)).count() == 2
    with _pytest.raises(ValueError, match="unsupported ingestion_type"):
        default_source_resolver(spark, mkrow("pdf-file", cv))
    # mysql-table builds a JDBC plan lazily (no driver in this env: the
    # load itself fails, which is the correct seam)
    with _pytest.raises(Exception):
        default_source_resolver(spark, mkrow("mysql-table", "host:3306"))


def test_save_control_roundtrip(spark, tmp_path, existing):
    from datalakeingestion_spark.config.control import load_control, save_control

    path = str(tmp_path / "control.csv")
    save_control(existing, path)
    back = load_control(spark, path)
    assert back.count() == 1
    r = back.first()
    assert r["tablename"] == "already_t" and r["lake_ingestion_id"] == 3


def test_run_groups_coalesce_expr_row(spark, tmp_path):
    """delta_field_expr control rows flow through the runner into the
    coalesce-watermark pipeline path (validation skipped, reference
    parity)."""
    rows = [
        (1, "2024-01-01 00:00:00", None),
        (2, "2024-01-02 00:00:00", "2024-01-05 00:00:00"),
    ]
    src = (
        spark.createDataFrame(rows, ["id", "c_s", "m_s"])
        .withColumn("created_datetime", F.to_timestamp("c_s"))
        .withColumn("modified_datetime", F.to_timestamp("m_s"))
        .drop("c_s", "m_s")
    )
    src_path = str(tmp_path / "src_co")
    src.write.parquet(src_path)
    row = (
        1, "parquet-table", src_path, "db1", "co", "created_datetime",
        "coalesce(modified_datetime, created_datetime)", 0, 1, "NULL",
        "c", "g", "s3", str(tmp_path / "lake" / "co"), "id",
        "vdb", "co_lv", 0, "()", "dag_c", "2024-01-01",
    )
    control = spark.createDataFrame([row], CONTROL_SCHEMA)
    report = run_groups(spark, control, str(tmp_path / "state"), groups=["dag_c"])
    assert report.results[1].status == STATUS_SUCCESS
    # conservative min-of-maxes watermark (C11): end_value = max(created)
    # = 01-02, so row 2 (modified 01-05 > end_value) is HELD BACK — written
    # now it would be re-pulled as a lake duplicate by the next window
    assert report.results[1].source_count == 1
    assert report.results[1].end_value == "2024-01-02 00:00:00.000000"
    from datalakeingestion_spark.ingest.watermark import ExecutionLog

    log = ExecutionLog(spark, str(tmp_path / "state"))
    assert log.latest_entry(1, STATUS_SUCCESS)["reason_code"] == "validation-skipped"

    # once created-activity passes the straggler's modified value, the
    # watermark window reaches it and it lands exactly once
    extra = (
        spark.createDataFrame(
            [(3, "2024-01-06 00:00:00", None)], "id long, c_s string, m_s string"
        )
        .withColumn("created_datetime", F.to_timestamp("c_s"))
        .withColumn("modified_datetime", F.to_timestamp("m_s"))
        .drop("c_s", "m_s")
    )
    extra.write.mode("append").parquet(src_path)
    # run 2: window reaches least(max modified=01-05, max created=01-06)
    # = 01-05 → straggler row 2 lands; row 3 (coalesce 01-06) now waits
    report2 = run_groups(spark, control, str(tmp_path / "state"), groups=["dag_c"])
    assert report2.results[1].status == STATUS_SUCCESS
    assert report2.results[1].source_count == 1
    assert report2.results[1].end_value == "2024-01-05 00:00:00.000000"
    # run 3: watermark passes 01-05 → row 3 lands; lake has each row ONCE
    report3 = run_groups(spark, control, str(tmp_path / "state"), groups=["dag_c"])
    assert report3.results[1].status == STATUS_SUCCESS
    assert report3.results[1].source_count == 1
    lake = spark.read.parquet(str(tmp_path / "lake" / "co"))
    assert sorted(r["id"] for r in lake.select("id").collect()) == [1, 2, 3]


def test_save_control_xlsx_roundtrip(spark, tmp_path, existing):
    """The reference's NATIVE control format: write the 21-column sheet
    as .xlsx (stdlib SpreadsheetML codec, no openpyxl), read it back
    through the schema cast, and get value-identical rows — including
    null cells and integer flags."""
    from datalakeingestion_spark.config.control import (
        load_control,
        save_control,
    )

    # add a row with nulls to exercise sparse-cell handling
    extra = spark.createDataFrame(
        [(
            4, "xlsx-file", None, "db2", "report_t", None, None,
            1, 0, None, None, None, "s3", "/lake/db2/report_t", None,
            None, None, 0, None, "dag_db2", None,
        )],
        existing.schema,
    )
    ctl = existing.unionByName(extra)
    path = str(tmp_path / "control.xlsx")
    save_control(ctl, path, fmt="xlsx")
    back = load_control(spark, path, fmt="xlsx")
    assert back.schema == ctl.schema
    want = sorted(map(tuple, ctl.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want
    # deterministic bytes: same table -> same file
    path2 = str(tmp_path / "control2.xlsx")
    save_control(ctl, path2, fmt="xlsx")
    assert open(path, "rb").read() == open(path2, "rb").read()
    # wrong columns are rejected loudly, not silently misaligned
    from datalakeingestion_spark.config.xlsx import write_xlsx

    bad = str(tmp_path / "bad.xlsx")
    write_xlsx(bad, ["not", "the", "control", "schema"], [["a", "b", "c", "d"]])
    with pytest.raises(ValueError, match="control sheet columns"):
        load_control(spark, bad, fmt="xlsx")


def test_load_control_xlsx_float_ints_and_cast_audit(spark, tmp_path, existing):
    """A producer storing 7 as the number cell 7.0 (pandas.to_excel does
    this for any int column holding a NaN) must load as int 7, not a
    silent NULL; a genuinely non-numeric cell in an int column raises
    instead of nulling the ingestion id."""
    from datalakeingestion_spark.config.control import (
        CONTROL_SCHEMA,
        load_control,
    )
    from datalakeingestion_spark.config.xlsx import write_xlsx

    cols = [f.name for f in CONTROL_SCHEMA.fields]
    base = {n: None for n in cols}
    row = dict(
        base,
        lake_ingestion_id=7.0,  # float-typed int cell
        ingestion_type="mysql-table",
        tablename="t7",
        date_not_available=0.0,
        active_indicator=1.0,
        view_needed=0.0,
        airflow_dag_group="g",
    )
    p = str(tmp_path / "floaty.xlsx")
    write_xlsx(p, cols, [[row[n] for n in cols]])
    [r] = load_control(spark, p, fmt="xlsx").collect()
    assert r["lake_ingestion_id"] == 7 and r["active_indicator"] == 1

    bad = dict(row, lake_ingestion_id="seven")
    p2 = str(tmp_path / "corrupt.xlsx")
    write_xlsx(p2, cols, [[bad[n] for n in cols]])
    with pytest.raises(ValueError, match="failed schema cast"):
        load_control(spark, p2, fmt="xlsx").collect()

    # fractional cell in an int column: double→int truncation would
    # FABRICATE id 7 from "7.5" — must raise, not truncate
    frac = dict(row, lake_ingestion_id=7.5)
    p3 = str(tmp_path / "fractional.xlsx")
    write_xlsx(p3, cols, [[frac[n] for n in cols]])
    with pytest.raises(ValueError, match="failed schema cast"):
        load_control(spark, p3, fmt="xlsx").collect()


def test_read_landing_xlsx_stdlib(spark, tmp_path):
    """Data-plane xlsx (S9 attachments) reads through read_landing with
    type inference: ints stay longs, mixed numerics become doubles,
    sparse cells are nulls, sharedStrings files (what pandas/openpyxl
    emit) parse too."""
    from datalakeingestion_spark.config.xlsx import write_xlsx
    from datalakeingestion_spark.sources.files import read_landing

    p = str(tmp_path / "report.xlsx")
    write_xlsx(
        p,
        ["campaign", "clicks", "spend"],
        [["brand", 10, 1.5], ["generic", 7, 2], ["null-row", None, None]],
    )
    df = read_landing(spark, p, "xlsx")
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "bigint", "double",
    ]
    rows = {r["campaign"]: (r["clicks"], r["spend"]) for r in df.collect()}
    assert rows["brand"] == (10, 1.5)
    assert rows["generic"] == (7, 2.0)
    assert rows["null-row"] == (None, None)

    # sharedStrings + explicit cell refs variant (openpyxl-style output)
    import zipfile

    p2 = str(tmp_path / "shared.xlsx")
    with zipfile.ZipFile(p, "r") as zin, zipfile.ZipFile(p2, "w") as zout:
        for name in zin.namelist():
            if name == "xl/worksheets/sheet1.xml":
                sheet = (
                    '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
                    'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
                    '<row r="1"><c r="A1" t="s"><v>0</v></c>'
                    '<c r="B1" t="s"><v>1</v></c></row>'
                    '<row r="2"><c r="A2" t="s"><v>2</v></c>'
                    '<c r="B2"><v>42</v></c></row>'
                    # sparse row: only column B present
                    '<row r="3"><c r="B3"><v>7</v></c></row>'
                    "</sheetData></worksheet>"
                )
                zout.writestr(name, sheet)
            else:
                zout.writestr(name, zin.read(name))
        zout.writestr(
            "xl/sharedStrings.xml",
            '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
            'org/spreadsheetml/2006/main"><si><t>name</t></si>'
            "<si><t>value</t></si><si><t>row-a</t></si></sst>",
        )
    df2 = read_landing(spark, p2, "xlsx")
    got = sorted(map(tuple, df2.collect()), key=lambda t: t[1])
    assert got == [(None, 7), ("row-a", 42)]


class _FakeMailbox:
    """Mailbox transport fake: real email.message.Message objects, the
    same shapes the reference parses (multipart attachment / HTML body
    with a view-report CTA link)."""

    def __init__(self, messages):
        self._messages = dict(messages)

    def search(self, sender, subject):
        return sorted(self._messages)

    def fetch(self, uid):
        return self._messages[uid]


def _attachment_email(filename, body_bytes):
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["From"] = "reports@ads.example"
    msg["Subject"] = "Your scheduled report is ready to view"
    msg.set_content("see attachment")
    msg.add_attachment(
        body_bytes, maintype="text", subtype="csv", filename=filename
    )
    return msg


def _link_email(url):
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["From"] = "ads-account-noreply@google.example"
    msg["Subject"] = "Your Google Ads report is ready"
    msg.set_content("view in browser")
    msg.add_alternative(
        f'<html><body><!-- CTA OUTLOOK END--><a href={url} >VIEW REPORT'
        "</a></body></html>",
        subtype="html",
    )
    return msg


def test_mailbox_fetcher_attachments_links_and_hostile_names(tmp_path):
    """The REAL parsing half of acquisition: attachments land under safe
    basenames, CTA links download through the injected opener, and a
    crafted ../ filename cannot escape the landing directory."""
    from datalakeingestion_spark.sources.fetch import MailboxFetcher

    csv_bytes = b"campaign,clicks\nbrand,10\n"
    mb = _FakeMailbox({
        "101": _attachment_email("bing_report.csv", csv_bytes),
        "102": _link_email("https://ads.example/report.csv"),
        "103": _attachment_email("../../evil.csv", b"owned\n"),
    })
    fetched_urls = []

    def opener(url):
        fetched_urls.append(url)
        return b"campaign,clicks\ngeneric,7\n"

    landing = str(tmp_path / "landing")
    out = MailboxFetcher(
        mb, sender="reports@ads.example", subject="report",
        url_opener=opener,
    ).fetch(landing)
    names = sorted(os.path.basename(p) for p in out)
    # ../../evil.csv is flattened to its sanitized basename
    assert names == ["bing_report.csv", "evil.csv", "report_102.csv"]
    assert fetched_urls == ["https://ads.example/report.csv"]
    assert open(os.path.join(landing, "bing_report.csv"), "rb").read() == csv_bytes
    # nothing escaped the landing dir
    assert not (tmp_path.parent / "evil.csv").exists()
    # visible files = exactly the landed reports; the per-uid idempotency
    # markers are dot-prefixed (invisible to Spark readers, same
    # convention as .staging-*)
    visible = {f for f in os.listdir(landing) if not f.startswith(".")}
    assert visible == set(names)
    assert {f for f in os.listdir(landing) if f.startswith(".")} == {
        ".landed-101", ".landed-102", ".landed-103"
    }


def test_run_groups_mailbox_to_lake_end_to_end(spark, tmp_path):
    """S9 acquisition → landing → lake in ONE run_groups call: the
    mailbox fetcher drops the report into the landing dir the control
    row points at, the csv-file resolver reads it, the pipeline lands
    parquet."""
    from datalakeingestion_spark.runner import make_fetching_resolver
    from datalakeingestion_spark.sources.fetch import (
        DirectoryFetcher,
        MailboxFetcher,
    )

    mb = _FakeMailbox({
        "7": _attachment_email(
            "ads.csv", b"row_id,campaign,clicks\n1,brand,10\n2,generic,7\n"
        ),
    })
    landing = str(tmp_path / "landing" / "ads")
    lake = str(tmp_path / "lake" / "ads")
    row = (
        11, "csv-file", landing, "db1", "ads", "row_id", "", 1, 1, "NULL",
        "c", "g", "s3", lake, "row_id", "vdb", "ads_lv", 0, "()",
        "dag_mail", "2024-01-01",
    )
    control = spark.createDataFrame([row], CONTROL_SCHEMA)
    resolver = make_fetching_resolver(
        {11: MailboxFetcher(mb, sender="reports@ads.example",
                            subject="report")}
    )
    report = run_groups(
        spark, control, str(tmp_path / "state"), groups=["dag_mail"],
        source_resolver=resolver,
    )
    assert report.succeeded == [11]
    landed = spark.read.parquet(lake)
    assert sorted(r["campaign"] for r in landed.collect()) == [
        "brand", "generic",
    ]

    # second flavor: the DirectoryFetcher fake feeding a fresh table
    pre = tmp_path / "downloaded"
    pre.mkdir()
    (pre / "extra.csv").write_text("row_id,campaign,clicks\n3,video,5\n")
    (pre / "notes.txt").write_text("ignore me")
    landing2 = str(tmp_path / "landing" / "ads2")
    lake2 = str(tmp_path / "lake" / "ads2")
    row2 = (
        12, "csv-file", landing2, "db1", "ads2", "row_id", "", 1, 1, "NULL",
        "c", "g", "s3", lake2, "row_id", "vdb", "ads2_lv", 0, "()",
        "dag_mail", "2024-01-01",
    )
    control2 = spark.createDataFrame([row2], CONTROL_SCHEMA)
    report2 = run_groups(
        spark, control2, str(tmp_path / "state2"), groups=["dag_mail"],
        source_resolver=make_fetching_resolver(
            {12: DirectoryFetcher(str(pre), pattern="*.csv")}
        ),
    )
    assert report2.succeeded == [12]
    assert spark.read.parquet(lake2).count() == 1
    assert os.listdir(landing2) == ["extra.csv"]  # .txt filtered


def test_run_groups_task_order_barriers_and_skip(spark, tmp_path):
    """Reference dag_lif.py:41-61 semantics: task_order stages run in
    sequence with a barrier between them; a stage failure SKIPS every
    later stage (all_success trigger rule) and logs the skip, while
    tables inside the failing stage are isolated from each other."""
    import threading

    from datalakeingestion_spark.ingest.watermark import (
        STATUS_SKIPPED,
        ExecutionLog,
    )

    events = load_table(spark, SF_SMALL, "events").limit(10)
    src = str(tmp_path / "src")
    events.selectExpr("event_id AS seq_id", "value").write.parquet(src)

    mk = lambda rid, tbl, srcdir: (
        rid, "parquet-table", srcdir, "db1", tbl, "seq_id", "", 1, 1, "NULL",
        "c", "g", "s3", str(tmp_path / "lake" / tbl), "", "vdb",
        f"{tbl}_lv", 0, "()", "dag_o", "2024-01-01",
    )
    control = spark.createDataFrame(
        [
            mk(1, "stage1_a", src),
            mk(2, "stage1_b", src),
            mk(3, "stage2_ok", src),
            mk(4, "stage2_bad", str(tmp_path / "missing")),  # fails
            mk(5, "stage3_never", src),
        ],
        CONTROL_SCHEMA,
    )
    orders = {
        "stage1_a": 1, "stage1_b": 1,
        "stage2_ok": 2, "stage2_bad": 2,
        "stage3_never": 3,
    }

    # record stage entry order via a resolver wrapper
    seen = []
    lock = threading.Lock()

    def resolver(spark_, row):
        with lock:
            seen.append(row["tablename"])
        return parquet_source_resolver(spark_, row)

    from datalakeingestion_spark.runner import parquet_source_resolver

    report = run_groups(
        spark, control, str(tmp_path / "state"), groups=["dag_o"],
        source_resolver=resolver, task_orders=orders,
        max_parallel_tables=4,
    )
    # stage 1 both succeed; stage 2: ok succeeds (isolated from bad),
    # bad fails; stage 3 skipped entirely
    assert sorted(report.succeeded) == [1, 2, 3]
    assert report.results[4].status == "failed"
    assert report.results[5].status == STATUS_SKIPPED
    # barrier ordering: every stage-1 resolution precedes every stage-2
    # resolution, and stage 3 never resolved at all
    pos = {t: i for i, t in enumerate(seen)}
    assert max(pos["stage1_a"], pos["stage1_b"]) < min(
        pos["stage2_ok"], pos["stage2_bad"]
    )
    assert "stage3_never" not in pos
    # the skip is durable state, not just an in-memory report
    log = ExecutionLog(spark, str(tmp_path / "state"))
    assert log.latest_entry(5, STATUS_SKIPPED) is not None
    # stage-3's lake path was never written
    import os as _os

    assert not _os.path.exists(str(tmp_path / "lake" / "stage3_never"))


def test_mailbox_fetcher_collisions_dotnames_and_link_fallback(tmp_path):
    """Review regressions: same-named attachments across messages get
    uid-prefixed instead of clobbered; '..' filenames can't resolve to a
    directory; link downloads happen only for a view-report CTA anchor,
    never the first href in the body."""
    from email.message import EmailMessage

    from datalakeingestion_spark.sources.fetch import MailboxFetcher

    def attach(name, body):
        m = EmailMessage()
        m["From"] = "r@x"; m["Subject"] = "report"
        m.set_content("x")
        m.add_attachment(body, maintype="text", subtype="csv", filename=name)
        return m

    def html(body_html):
        m = EmailMessage()
        m["From"] = "r@x"; m["Subject"] = "report"
        m.set_content("x")
        m.add_alternative(body_html, subtype="html")
        return m

    mb = _FakeMailbox({
        "1": attach("report.csv", b"day1\n"),
        "2": attach("report.csv", b"day2\n"),
        "3": attach("..", b"dots\n"),
        # first href is an unsubscribe link; NO view-report CTA -> no fetch
        "4": html('<a href="https://x/unsub">unsubscribe</a> plain mail'),
        # anchor text is the CTA -> fetch via the text-matched fallback
        "5": html('<a href="https://x/logo">logo</a>'
                  '<a href="https://x/report.csv" class="c">VIEW REPORT</a>'),
    })
    urls = []
    landing = str(tmp_path / "landing")
    out = MailboxFetcher(
        mb, sender="r@x", subject="report",
        url_opener=lambda u: urls.append(u) or b"data\n",
    ).fetch(landing)
    names = sorted(os.path.basename(p) for p in out)
    assert names == [
        "2_report.csv", "attachment", "report.csv", "report_5.csv",
    ]
    assert urls == ["https://x/report.csv"]
    assert open(os.path.join(landing, "report.csv"), "rb").read() == b"day1\n"
    assert open(os.path.join(landing, "2_report.csv"), "rb").read() == b"day2\n"

    # cross-RUN collision: a second fetch() against the same landing dir
    # (tomorrow's scheduler tick) must not clobber yesterday's report —
    # the `used` set is seeded from the directory listing
    mb2 = _FakeMailbox({"9": attach("report.csv", b"day3\n")})
    out2 = MailboxFetcher(mb2, sender="r@x", subject="report").fetch(landing)
    assert [os.path.basename(p) for p in out2] == ["9_report.csv"]
    assert open(os.path.join(landing, "report.csv"), "rb").read() == b"day1\n"
    assert open(os.path.join(landing, "9_report.csv"), "rb").read() == b"day3\n"

    # cross-run IDEMPOTENCY: the IMAP search returning an ALREADY-landed
    # uid again (searches are by sender+subject, old mail stays visible)
    # must not land a second copy — the per-uid marker skips it
    out3 = MailboxFetcher(mb2, sender="r@x", subject="report").fetch(landing)
    assert out3 == []
    csvs = [f for f in os.listdir(landing) if f.endswith(".csv")]
    assert sorted(csvs) == sorted(
        [f for f in os.listdir(landing) if f.endswith(".csv")]
    )
    assert not os.path.exists(os.path.join(landing, "9_1_report.csv"))


def test_run_groups_barrier_trips_on_validation_failure(spark, tmp_path, monkeypatch):
    """A validation failure (load rolled back) must gate later stages
    exactly like a hard failure — downstream staging tables cannot
    build on a missing upstream."""
    from datalakeingestion_spark.ingest.pipeline import (
        IncrementalIngestJob,
        IngestResult,
    )
    from datalakeingestion_spark.ingest.watermark import (
        STATUS_SKIPPED,
        STATUS_VALIDATION_FAILURE,
    )

    events = load_table(spark, SF_SMALL, "events").limit(5)
    src = str(tmp_path / "src")
    events.selectExpr("event_id AS seq_id", "value").write.parquet(src)
    mk = lambda rid, tbl: (
        rid, "parquet-table", src, "db1", tbl, "seq_id", "", 1, 1, "NULL",
        "c", "g", "s3", str(tmp_path / "lake" / tbl), "", "vdb",
        f"{tbl}_lv", 0, "()", "dag_v", "2024-01-01",
    )
    control = spark.createDataFrame(
        [mk(1, "s1_bad_counts"), mk(2, "s2_never")], CONTROL_SCHEMA
    )

    real_run = IncrementalIngestJob.run

    def fake_run(self):
        if self.ingestion_id == 1:
            return IngestResult(STATUS_VALIDATION_FAILURE, "")
        return real_run(self)

    monkeypatch.setattr(IncrementalIngestJob, "run", fake_run)
    report = run_groups(
        spark, control, str(tmp_path / "state"), groups=["dag_v"],
        task_orders={"s1_bad_counts": 1, "s2_never": 2},
    )
    assert report.results[1].status == STATUS_VALIDATION_FAILURE
    assert report.results[2].status == STATUS_SKIPPED


def test_fetcher_failure_isolated_per_table(spark, tmp_path):
    """A fetcher that raises (mailbox down, bad credentials) fails ONLY
    its table — the failure is caught by run_one's extraction guard,
    logged, and sibling tables in the same run still land."""
    from datalakeingestion_spark.runner import make_fetching_resolver

    events = load_table(spark, SF_SMALL, "events").limit(5)
    src = str(tmp_path / "src")
    events.selectExpr("event_id AS seq_id", "value").write.parquet(src)

    class DownFetcher:
        def fetch(self, landing_dir):
            raise ConnectionError("mailbox unreachable")

    mk = lambda rid, tbl, itype, srcdir: (
        rid, itype, srcdir, "db1", tbl, "seq_id", "", 1, 1, "NULL",
        "c", "g", "s3", str(tmp_path / "lake" / tbl), "", "vdb",
        f"{tbl}_lv", 0, "()", "dag_f", "2024-01-01",
    )
    control = spark.createDataFrame(
        [
            mk(1, "ok_table", "parquet-table", src),
            mk(2, "mailbox_down", "csv-file", str(tmp_path / "landing")),
        ],
        CONTROL_SCHEMA,
    )
    report = run_groups(
        spark, control, str(tmp_path / "state"), groups=["dag_f"],
        source_resolver=make_fetching_resolver({2: DownFetcher()}),
    )
    assert report.succeeded == [1]
    assert report.results[2].status == "failed"
    from datalakeingestion_spark.ingest.watermark import ExecutionLog

    log = ExecutionLog(spark, str(tmp_path / "state"))
    entry = log.latest_entry(2, "failed")
    assert entry is not None
