"""Optional Neo4j-compatible ingest path.

The primary KG backend is the in-process store (:mod:`...kg.store`), but
users migrating from the reference may still want the graph in a Neo4j
server.  This module exports a :class:`CamouflageKnowledgeStore` through the
same MERGE-based, constraint-guarded write pattern the reference used
(``ingest_to_neo4j.py:200-403``) — gated on the ``neo4j`` driver being
importable (it is not part of this framework's requirements).
"""

from __future__ import annotations

from typing import Optional

from camouflage_multimodal_tpu.kg.store import CamouflageKnowledgeStore


def neo4j_available() -> bool:
    try:
        import neo4j  # noqa: F401

        return True
    except ImportError:
        return False


_CONSTRAINTS = [
    "CREATE CONSTRAINT organism_name IF NOT EXISTS FOR (o:Organism) REQUIRE o.name IS UNIQUE",
    "CREATE CONSTRAINT color_name IF NOT EXISTS FOR (c:Color) REQUIRE c.name IS UNIQUE",
    "CREATE CONSTRAINT texture_name IF NOT EXISTS FOR (t:Texture) REQUIRE t.name IS UNIQUE",
    "CREATE CONSTRAINT pattern_type IF NOT EXISTS FOR (p:Pattern) REQUIRE p.type IS UNIQUE",
    "CREATE CONSTRAINT observation_id IF NOT EXISTS FOR (oc:ObservationContext) REQUIRE oc.id IS UNIQUE",
    "CREATE CONSTRAINT assessment_id IF NOT EXISTS FOR (ca:CamouflageAssessment) REQUIRE ca.id IS UNIQUE",
    "CREATE CONSTRAINT similarity_id IF NOT EXISTS FOR (sm:SimilarityMetric) REQUIRE sm.id IS UNIQUE",
    "CREATE CONSTRAINT lighting_condition IF NOT EXISTS FOR (lc:LightingCondition) REQUIRE lc.condition IS UNIQUE",
]


def export_to_neo4j(store: CamouflageKnowledgeStore, uri: str, user: str,
                    password: str, database: str = "neo4j",
                    batch_size: int = 50) -> int:
    """Write the whole store into a Neo4j database. Returns node-write count.

    Idempotent: every write is a MERGE keyed the same way the reference's
    uniqueness constraints were.
    """
    if not neo4j_available():
        raise RuntimeError("neo4j driver not installed; the in-process store "
                           "(CamouflageKnowledgeStore) is the supported backend")
    from neo4j import GraphDatabase

    driver = GraphDatabase.driver(uri, auth=(user, password))
    writes = 0
    try:
        with driver.session(database=database) as session:
            for c in _CONSTRAINTS:
                try:
                    session.run(c)
                except Exception:
                    pass

            def tx_fn(tx):
                nonlocal writes
                for name, org in store.organisms.items():
                    tx.run("MERGE (o:Organism {name: $n}) SET o.category = $c",
                           n=name, c=org["category"])
                    writes += 1
                    for color in org["colors"]:
                        tx.run("MERGE (c:Color {name: $c}) WITH c "
                               "MATCH (o:Organism {name: $n}) MERGE (o)-[:HAS_COLOR]->(c)",
                               c=color, n=name)
                    for tex in org["textures"]:
                        tx.run("MERGE (t:Texture {name: $t}) WITH t "
                               "MATCH (o:Organism {name: $n}) MERGE (o)-[:HAS_TEXTURE]->(t)",
                               t=tex, n=name)
                    for pat in org["patterns"]:
                        tx.run("MERGE (p:Pattern {type: $p}) WITH p "
                               "MATCH (o:Organism {name: $n}) MERGE (o)-[:HAS_PATTERN]->(p)",
                               p=pat, n=name)
                for env_key, env in store.environments.items():
                    etype, desc, src = env_key
                    tx.run("MERGE (e:Environment {type: $t, description: $d, source_file: $s}) "
                           "SET e.lighting_condition = $l",
                           t=etype, d=desc, s=src, l=env["lighting"])
                    writes += 1
                for aid, ca in store.assessments.items():
                    etype, desc, src = ca["env_key"]
                    tx.run("MERGE (ca:CamouflageAssessment {id: $id}) "
                           "SET ca.camouflage_score=$sc, ca.confidence=$cf, "
                           "    ca.is_camouflaged=$ic, ca.camouflage_type=$ct "
                           "WITH ca MATCH (e:Environment {type:$t, description:$d, source_file:$s}) "
                           "MERGE (e)-[:HAS_CAMOUFLAGE_ASSESSMENT]->(ca)",
                           id=aid, sc=ca["camouflage_score"], cf=ca["confidence"],
                           ic=ca["is_camouflaged"], ct=ca["camouflage_type"],
                           t=etype, d=desc, s=src)
                    writes += 1
                for sid, sm in store.similarities.items():
                    tx.run("MERGE (sm:SimilarityMetric {id: $id}) "
                           "SET sm.color_similarity=$cs, sm.texture_similarity=$ts, "
                           "    sm.contrast_difference=$cd "
                           "WITH sm MATCH (ca:CamouflageAssessment {id: $aid}) "
                           "MERGE (ca)-[:HAS_SIMILARITY]->(sm)",
                           id=sid, cs=sm["color_similarity"], ts=sm["texture_similarity"],
                           cd=sm["contrast_difference"], aid=sm["assessment_id"])
                    writes += 1
                for oid, obs in store.observations.items():
                    etype, desc, src = obs["env_key"]
                    tx.run("MERGE (oc:ObservationContext {id: $id}) SET oc.source_file=$s "
                           "WITH oc MATCH (o:Organism {name: $n}) "
                           "MATCH (e:Environment {type:$t, description:$d, source_file:$s}) "
                           "MERGE (oc)-[:HAS_ORGANISM]->(o) MERGE (oc)-[:OBSERVED_IN]->(e)",
                           id=oid, s=src, n=obs["organism"], t=etype, d=desc)
                    writes += 1

            session.execute_write(tx_fn)
    finally:
        driver.close()
    return writes
