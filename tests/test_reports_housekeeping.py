"""S13 image/report sinks and S14 archive housekeeping (infra sinks:
behavior-tested, no SQL oracle — same contract as S8/S11)."""

import json
import os
import tarfile

import pytest


def test_sparkline_png_renders_and_decodes():
    import numpy as np

    from coronavirus_dashboard_pipeline_etl_spark.functions.multimodal import (
        _parse_png,
    )
    from coronavirus_dashboard_pipeline_etl_spark.sources.reports import (
        render_sparkline_png,
    )

    png = render_sparkline_png([0.0, 10.0, 5.0], width=20, height=12, pad=2)
    w, h, rgb = _parse_png(png)
    assert (w, h) == (20, 12)
    img = rgb.reshape(12, 20, 3)
    # min value column: line pixel at the bottom of the inner box;
    # max value column: line pixel at the top
    assert img[9, 2].tolist() == [0, 91, 171]       # first point (v=0), bottom
    assert img[2, 10].tolist() == [0, 91, 171]      # middle point (v=10), top
    # fill runs from the line down to the baseline
    assert img[5, 10].tolist() in ([186, 216, 240], [0, 91, 171])
    # background untouched in the padding frame
    assert img[0, 0].tolist() == [247, 249, 250]
    # determinism: same series -> same bytes
    assert png == render_sparkline_png([0.0, 10.0, 5.0], width=20, height=12, pad=2)
    # gaps: None leaves the column at background
    png2 = render_sparkline_png([1.0, None, 1.0], width=20, height=12, pad=2)
    _, _, rgb2 = _parse_png(png2)
    with pytest.raises(ValueError, match="too small"):
        render_sparkline_png([1], width=4, height=4, pad=3)


def test_og_image_sink_distributed_write(spark, tmp_path):
    from coronavirus_dashboard_pipeline_etl_spark.functions.multimodal import (
        _parse_png,
    )
    from coronavirus_dashboard_pipeline_etl_spark.sources.reports import (
        og_image_frame,
        sitemap_xml,
        write_og_images,
    )

    rows = [
        ("E01", "2021-01-01", 1.0),
        ("E01", "2021-01-03", 3.0),
        ("E01", "2021-01-02", 2.0),
        ("E02", "2021-01-01", 7.0),
    ]
    df = spark.createDataFrame(rows, "areaCode string, date string, value double")
    images = og_image_frame(df, width=24, height=16)
    got = {r.areaCode: r for r in images.collect()}
    assert got["E01"].n_points == 3 and got["E02"].n_points == 1
    w, h, _ = _parse_png(bytes(got["E01"].png))
    assert (w, h) == (24, 16)

    out = tmp_path / "og"
    n = write_og_images(images, str(out))
    assert n == 2
    files = sorted(os.listdir(out))
    assert files == ["E01.png", "E02.png"]
    w, h, _ = _parse_png(open(out / "E01.png", "rb").read())
    assert (w, h) == (24, 16)

    xml = sitemap_xml(["area/E01", "area/E02"], "https://example.org", "2021-01-03")
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)
    locs = [u[0].text for u in root]
    assert locs == ["https://example.org/area/E01", "https://example.org/area/E02"]


def test_archive_releases_lifecycle(tmp_path):
    from coronavirus_dashboard_pipeline_etl_spark.sources.housekeeping import (
        archive_releases,
    )

    src = tmp_path / "releases"
    arc = tmp_path / "archive"
    src.mkdir()
    for day in ("2021-01-01", "2021-01-02", "2021-01-03", "2021-01-04"):
        for artifact in ("data.json", "qa.csv"):
            (src / f"{day}_{artifact}").write_bytes(f"{day}:{artifact}".encode())

    report = archive_releases(str(src), str(arc), keep_latest=2)
    # two oldest groups archived; two newest stay live
    assert sorted(report) == ["2021-01-01", "2021-01-02"]
    assert report["2021-01-01"]["files"] == 2
    live = sorted(os.listdir(src))
    assert live == [
        "2021-01-03_data.json", "2021-01-03_qa.csv",
        "2021-01-04_data.json", "2021-01-04_qa.csv",
    ]
    with tarfile.open(arc / "2021-01-01.tar.bz2") as tar:
        names = tar.getnames()
        assert names == ["2021-01-01_data.json", "2021-01-01_qa.csv"]
        data = tar.extractfile(names[0]).read()
        assert data == b"2021-01-01:data.json"
    manifest = json.load(open(arc / "2021-01-01.manifest.json"))
    assert [m["name"] for m in manifest["members"]] == names
    assert all(len(m["sha256"]) == 64 for m in manifest["members"])

    # byte-stable re-run on an equivalent tree (pinned mtimes)
    src2 = tmp_path / "releases2"
    src2.mkdir()
    for day in ("2021-01-01", "2021-01-02", "2021-01-03", "2021-01-04"):
        for artifact in ("data.json", "qa.csv"):
            (src2 / f"{day}_{artifact}").write_bytes(f"{day}:{artifact}".encode())
    arc2 = tmp_path / "archive2"
    archive_releases(str(src2), str(arc2), keep_latest=2)
    assert (arc / "2021-01-01.tar.bz2").read_bytes() == (
        arc2 / "2021-01-01.tar.bz2"
    ).read_bytes()

    # dispose=False keeps originals
    src3 = tmp_path / "releases3"
    src3.mkdir()
    (src3 / "2020-01-01_x").write_bytes(b"x")
    (src3 / "2020-01-02_x").write_bytes(b"y")
    archive_releases(str(src3), str(tmp_path / "a3"), keep_latest=1, dispose=False)
    assert sorted(os.listdir(src3)) == ["2020-01-01_x", "2020-01-02_x"]
    with pytest.raises(ValueError, match="compression"):
        archive_releases(str(src3), str(tmp_path / "a4"), compression="zip")


def test_warc_source_parse_and_errors(spark, tmp_path):
    """WARC: spec framing round-trips plain and gzip-member archives
    through the distributed binaryFile reader; malformed framing is
    loud; warcinfo/request records ride along with their types."""
    from coronavirus_dashboard_pipeline_etl_spark.sources.warc import (
        build_warc,
        parse_warc_bytes,
        read_warc,
    )

    recs = [
        ("warcinfo", None, "2024-01-01T00:00:00Z", b"software: engine"),
        ("request", "https://x.org/a", "2024-01-01T00:00:01Z", b"GET /a"),
        ("response", "https://x.org/a", "2024-01-01T00:00:02Z",
         "héllo wörld".encode()),
    ]
    plain = build_warc(recs)
    gz = build_warc(recs, gzip_members=True)
    (tmp_path / "a.warc").write_bytes(plain)
    (tmp_path / "b.warc.gz").write_bytes(gz)

    out = read_warc(spark, str(tmp_path)).collect()
    assert len(out) == 6  # both files carry all three records
    by_file = {}
    for r in out:
        by_file.setdefault(r.source_file.rsplit("/", 1)[-1], []).append(r)
    for rows in by_file.values():
        types = sorted(r.record_type for r in rows)
        assert types == ["request", "response", "warcinfo"]
        resp = next(r for r in rows if r.record_type == "response")
        assert bytes(resp.content).decode() == "héllo wörld"
        assert resp.content_length == len("héllo wörld".encode())
        assert resp.target_uri == "https://x.org/a"
        info = next(r for r in rows if r.record_type == "warcinfo")
        assert info.target_uri is None

    # loud failure paths
    with pytest.raises(ValueError, match="bad record header"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(plain[:-10])
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n")
