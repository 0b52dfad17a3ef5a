"""CLI entry tests (reference bin/memex arg parsing, main.rs:20-48)."""

from memex_tpu.__main__ import main


def test_migrate_command(tmp_path):
    db = tmp_path / "mig.db"
    rc = main(["migrate", "--database-connection", f"sqlite://{db}"])
    assert rc == 0
    assert db.exists()
    # idempotent
    assert main(["migrate", "--database-connection", f"sqlite://{db}"]) == 0


def test_serve_rejects_bad_roles(tmp_path, monkeypatch):
    monkeypatch.setenv("DATABASE_CONNECTION", f"sqlite://{tmp_path}/x.db")
    from memex_tpu import runtime as rt_mod

    rt_mod.reset_runtime()
    rc = main(["serve", "--roles", "Bogus"])
    assert rc == 2
    rt_mod.reset_runtime()


def test_load_command(tmp_path, monkeypatch):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "a.txt").write_text("first document about foxes")
    (docs / "b.txt").write_text("second document about dogs")
    monkeypatch.setenv("DATABASE_CONNECTION", f"sqlite://{tmp_path}/load.db")
    monkeypatch.setenv("VECTOR_CONNECTION", "memory://")
    from memex_tpu import runtime as rt_mod

    rt_mod.reset_runtime()
    rc = main(["load", "docs", str(docs)])
    assert rc == 0
    rt = rt_mod.get_runtime()
    row = rt.db.query_one("SELECT COUNT(*) AS n FROM queue WHERE collection='docs'")
    assert row["n"] == 2
    rt_mod.reset_runtime()
