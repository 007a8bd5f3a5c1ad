"""Master-resolution rules: the builder must never override a
launcher-configured cluster manager with local[] (ADVICE r2)."""

from __future__ import annotations

from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import (
    _launcher_master_configured,
)


def test_gateway_port_signals_launcher(monkeypatch):
    monkeypatch.delenv("PYSPARK_SUBMIT_ARGS", raising=False)
    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "55555")
    assert _launcher_master_configured()


def test_submit_args_master_signals_launcher(monkeypatch):
    monkeypatch.delenv("PYSPARK_GATEWAY_PORT", raising=False)
    monkeypatch.setenv(
        "PYSPARK_SUBMIT_ARGS", "--master yarn pyspark-shell"
    )
    assert _launcher_master_configured()


def test_no_signals_means_local_fallback(monkeypatch):
    import pytest
    from pyspark import SparkConf
    from pyspark.context import SparkContext

    monkeypatch.delenv("PYSPARK_GATEWAY_PORT", raising=False)
    monkeypatch.setenv("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
    if SparkContext._jvm is not None and SparkConf(loadDefaults=True).contains(
        "spark.master"
    ):
        # a JVM launched earlier in this process already fixed
        # spark.master (system property) — the conf signal firing IS the
        # desired behavior, but it makes the no-signal case untestable
        pytest.skip("JVM in this process already carries spark.master")
    assert not _launcher_master_configured()


def test_spark_defaults_file_signal(monkeypatch, tmp_path):
    """Pre-JVM, spark.master in spark-defaults.conf must be detected by
    reading the file (the JVM-less SparkConf can't see it)."""
    from sec_financial_data_pipeline_using_snowflake_dbt_spark.session import (
        _spark_defaults_has_master,
    )

    conf_dir = tmp_path / "conf"
    conf_dir.mkdir()
    monkeypatch.setenv("SPARK_CONF_DIR", str(conf_dir))
    (conf_dir / "spark-defaults.conf").write_text(
        "# comment\nspark.eventLog.enabled true\n"
    )
    assert not _spark_defaults_has_master()
    (conf_dir / "spark-defaults.conf").write_text(
        "spark.master yarn\nspark.eventLog.enabled true\n"
    )
    assert _spark_defaults_has_master()
    # prefix-only names must not false-positive
    (conf_dir / "spark-defaults.conf").write_text("spark.masterful x\n")
    assert not _spark_defaults_has_master()
