from reden_ray.core.dates import compare_date, process_date, scrub_kb_date


def test_process_date():
    assert process_date("1802-02-26") == 1802
    assert process_date("1802") == 1802
    assert process_date("18..") is None
    assert process_date("not a date") is None


def test_compare_date_overlap():
    assert compare_date(1800, 1870, 1850, 1900) == 20.0
    assert compare_date(1800, 1820, 1850, 1900) == 0.0


def test_scrub_kb_date():
    assert scrub_kb_date("1854^^http://www.w3.org/2001/XMLSchema#integer") == "1854"
    assert scrub_kb_date("18..") == "18.."
    assert scrub_kb_date("8..") == "8.."
    assert scrub_kb_date("1854-07-02") == "1854"
    assert scrub_kb_date("circa 1850") == "-"
    assert scrub_kb_date(None) == "-"
