"""T&T submission packaging + upload protocol (reference
tools/tanks.log/upload_t2_results.py:75-164), with a mocked transport —
this environment has no egress."""
import os

import numpy as np
import pytest

from mdfnet_tpu.benchmarks import tanks_submit as ts


@pytest.fixture()
def packaged(tmp_path):
    ply_dir = tmp_path / "plys"
    log_dir = tmp_path / "logs"
    ply_dir.mkdir()
    log_dir.mkdir()
    (ply_dir / "Family.ply").write_bytes(b"ply\ncontent")
    (log_dir / "Family.log").write_text("trajectory")
    out = str(tmp_path / "sub")
    sums = ts.package_submission(str(ply_dir), str(log_dir), out,
                                 scenes=("Family",), log_fn=None)
    return out, sums


def test_package_manifest_format(packaged):
    out, sums = packaged
    assert set(sums) == {"Family.ply", "Family.log"}
    lines = open(os.path.join(out, "md5.txt")).read().splitlines()
    # reference generate_md5_file format: "<md5>  <name>"
    assert lines == [f"{sums['Family.log']}  Family.log",
                     f"{sums['Family.ply']}  Family.ply"]
    assert os.path.exists(os.path.join(out, "Family.ply"))
    assert os.path.exists(os.path.join(out, "Family.log"))


def test_upload_posts_presigned_policies(packaged, tmp_path, monkeypatch):
    out, _ = packaged
    cred = tmp_path / "cred.txt"
    cred.write_text("POLICYA###SIGA###Family.ply\n"
                    "POLICYB###SIGB###Family.log\n"
                    "###results/42/###svc@t2.iam###2099-01-01\n")

    posts = []

    class FakeResponse:
        status_code = 204

    class FakeSession:
        def post(self, url, data=None, files=None, headers=None):
            posts.append((url, dict(data)))
            return FakeResponse()

    import requests
    monkeypatch.setattr(requests, "Session", FakeSession)
    ts.upload_submission(out, str(cred), scenes=("Family",), log_fn=None)

    assert len(posts) == 2
    url, policy = posts[0]
    assert url == "http://t2-website-userdata.storage.googleapis.com"
    assert policy["key"] == "results/42/Family.ply"
    assert policy["policy"] == "POLICYA" and policy["signature"] == "SIGA"
    assert policy["GoogleAccessId"] == "svc@t2.iam"
    assert posts[1][1]["key"] == "results/42/Family.log"
    assert posts[1][1]["policy"] == "POLICYB"
