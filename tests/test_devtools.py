"""Self-contained dev tooling (bandit/interrogate/vulture equivalents)."""

import textwrap

from tiny_audio_tpu.devtools import dead_code, docstring_coverage, security_scan


def _write(tmp_path, name, src):
    p = tmp_path / name
    p.write_text(textwrap.dedent(src))
    return p


class TestSecurityScan:
    def test_flags_the_dangerous_calls(self, tmp_path):
        _write(tmp_path, "bad.py", """
            import os, pickle, subprocess, tempfile, yaml, torch

            def f(blob, cmd, path):
                eval("1+1")
                pickle.loads(blob)
                yaml.load(blob)
                subprocess.run(cmd, shell=True)
                os.system(cmd)
                tempfile.mktemp()
                torch.load(path)
        """)
        codes = sorted(f.code for f in security_scan([tmp_path]))
        assert codes == ["S102", "S301", "S302", "S306", "S506", "S602", "S602"]

    def test_safe_variants_pass(self, tmp_path):
        _write(tmp_path, "ok.py", """
            import subprocess, yaml, torch

            def f(cmd, blob, path):
                subprocess.run(cmd)
                yaml.load(blob, Loader=yaml.SafeLoader)
                yaml.safe_load(blob)
                torch.load(path, weights_only=True)
        """)
        assert security_scan([tmp_path]) == []

    def test_repo_is_clean(self):
        from pathlib import Path

        repo = Path(__file__).resolve().parent.parent
        assert security_scan([repo / "tiny_audio_tpu", repo / "scripts"]) == []


class TestDocstringCoverage:
    def test_counts_public_defs(self, tmp_path):
        _write(tmp_path, "m.py", '''
            """Module doc."""

            def documented():
                """Yes."""

            def bare():
                pass

            def _private():
                pass

            class C:
                """Doc."""
        ''')
        pct, missing = docstring_coverage([tmp_path])
        # module + documented + bare + C = 4 units, 1 missing
        assert len(missing) == 1 and missing[0].message.endswith("docstring")
        assert abs(pct - 75.0) < 1e-6

    def test_repo_above_reference_bar(self):
        from pathlib import Path

        repo = Path(__file__).resolve().parent.parent
        pct, _ = docstring_coverage([repo / "tiny_audio_tpu"])
        assert pct >= 50.0  # the reference's interrogate --fail-under 50


class TestDeadCode:
    def test_unreferenced_def_flagged(self, tmp_path):
        _write(tmp_path, "a.py", """
            def used():
                pass

            def orphan():
                pass
        """)
        _write(tmp_path, "b.py", """
            from a import used

            used()
        """)
        names = {f.message for f in dead_code([tmp_path])}
        assert any("orphan" in m for m in names)
        assert not any("'used'" in m for m in names)

    def test_entry_points_exempt(self, tmp_path):
        _write(tmp_path, "m.py", """
            def main():
                pass
        """)
        assert dead_code([tmp_path]) == []
