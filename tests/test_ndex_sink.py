"""S8 NDEx upload sink: request shape, auth, control flow (no network).

Reference parity: main.py:100-106 — credential gate, Ndex2 client
construction, save_new_cx2_network(cx2_network.to_cx2()).
"""

import base64
import json

import pytest

from llm_text_to_knowledge_graph_spark.export.ndex import (
    NdexClient,
    NdexTransportDisabled,
    upload_to_ndex,
)

CX2 = [
    {"CXVersion": "2.0", "hasFragments": False},
    {"metaData": [{"name": "nodes", "elementCount": 1}]},
    {"nodes": [{"id": 0, "v": {"name": "AKT1"}}]},
    {"status": [{"success": True}]},
]


def fake_transport(log):
    def transport(request):
        log.append(request)
        return {
            "status": 201,
            "headers": {
                "Location": "https://www.ndexbio.org/v3/networks/"
                "12345678-aaaa-bbbb-cccc-1234567890ab"
            },
        }

    return transport


def test_save_builds_v3_post_with_basic_auth_and_exact_body():
    log = []
    client = NdexClient("user@example.org", "pw", transport=fake_transport(log))
    uuid = client.save_new_cx2_network(CX2)
    assert uuid == "12345678-aaaa-bbbb-cccc-1234567890ab"
    (req,) = log
    assert req["method"] == "POST"
    assert req["url"] == "https://www.ndexbio.org/v3/networks?visibility=PRIVATE"
    expected = "Basic " + base64.b64encode(b"user@example.org:pw").decode()
    assert req["headers"]["Authorization"] == expected
    assert req["headers"]["Content-Type"] == "application/json"
    assert json.loads(req["body"]) == CX2  # CX2 aspect list round-trips intact


def test_visibility_and_server_are_parameterized():
    log = []
    client = NdexClient(
        "u", "p", server="https://test.ndexbio.org/", transport=fake_transport(log)
    )
    client.save_new_cx2_network(CX2, visibility="PUBLIC")
    assert log[0]["url"] == "https://test.ndexbio.org/v3/networks?visibility=PUBLIC"


def test_missing_credentials_refuse_like_reference():
    # main.py:101-103: error + early return when email/password absent.
    assert upload_to_ndex(CX2, None, "pw") is None
    assert upload_to_ndex(CX2, "u", "") is None
    with pytest.raises(ValueError):
        NdexClient("", "pw")


def test_default_transport_refuses_instead_of_pretending():
    client = NdexClient("u", "p")
    with pytest.raises(NdexTransportDisabled):
        client.save_new_cx2_network(CX2)


def test_http_error_surfaces():
    client = NdexClient("u", "p", transport=lambda r: {"status": 401, "headers": {}})
    with pytest.raises(RuntimeError, match="401"):
        client.save_new_cx2_network(CX2)


def test_non_list_payload_rejected():
    client = NdexClient("u", "p", transport=fake_transport([]))
    with pytest.raises(TypeError):
        client.save_new_cx2_network({"not": "a cx2 aspect list"})


def test_upload_partition_streams_one_client_per_partition():
    from llm_text_to_knowledge_graph_spark.export.ndex import upload_partition

    class Row:
        def __init__(self, name, cx2_json):
            self.name = name
            self.cx2_json = cx2_json

    log = []
    rows = [Row("netA", json.dumps(CX2)), Row("netB", json.dumps(CX2))]
    out = list(
        upload_partition(rows, "u", "p", transport=fake_transport(log))
    )
    assert out == [
        ("netA", "12345678-aaaa-bbbb-cccc-1234567890ab"),
        ("netB", "12345678-aaaa-bbbb-cccc-1234567890ab"),
    ]
    assert len(log) == 2
