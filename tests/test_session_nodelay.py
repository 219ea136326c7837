"""The r13 py4j latency fix: get_spark must leave every gateway
command connection with TCP_NODELAY set (Nagle off), honoring the
SPARK_GRAFT_PY4J_NODELAY=0 opt-out for the patch itself."""

from __future__ import annotations

import socket


def test_gateway_sockets_have_nodelay(spark):
    conns = list(spark.sparkContext._gateway._gateway_client.deque)
    assert conns, "expected at least one live py4j connection"
    for c in conns:
        assert c.socket.getsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY) == 1


def test_new_connections_inherit_nodelay(spark):
    from py4j import clientserver

    assert getattr(
        clientserver.ClientServerConnection.connect_to_java_server,
        "_nodelay_patched",
        False,
    )


def test_legacy_gateway_mode_also_patched(spark):
    """r14 (ADVICE): under PYSPARK_PIN_THREAD=false the command channel
    is py4j.java_gateway.GatewayConnection — its start() must carry the
    NODELAY patch too, so the env opt-in covers both gateway modes."""
    from py4j import java_gateway

    assert getattr(
        java_gateway.GatewayConnection.start, "_nodelay_patched", False
    )
