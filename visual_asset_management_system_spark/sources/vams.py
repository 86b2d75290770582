"""VAMS-shaped derived views over the driver's TPC-H-ish tables.

The reference's domain tables (assets / files / metadata / asset_links /
asset_versions — FIXTURES.md §1-3) don't exist in the driver's fixture
set, so we *derive* them deterministically from the TPC-H-ish tables
using the mapping in FIXTURES.md §7 (part → assets, lineitem → files,
orders → metadata EAV, part self-edges → asset_links).

Every derivation below is a single ANSI-SQL SELECT that parses and
evaluates identically in Spark SQL and DuckDB.  Spark registers them as
temp views; the DuckDB oracle inlines them as CTEs (``oracle_with``).
That shared-SQL trick is what makes the VAMS-domain operators (search
compiler, EAV pivot, graph traversal, version as-of) differentially
testable against the oracle even though the fixture tables are synthetic.

Reference data model being emulated:
- assets:      AssetStorageTable item shape
  (/root/reference/infra/lib/nestedStacks/storage/storageBuilder-nestedStack.ts:711-746)
- files:       FileDocumentModel (/root/reference/backend/backend/models/indexing.py:125-192)
- metadata:    AssetFileMetadataStorageTableV2 EAV rows
  (/root/reference/backend/backend/handlers/metadata/metadataService.py:1460-1479)
- asset_links: models/assetLinks.py:16-49
- asset_versions: AssetVersionsStorageTableV2 (storageBuilder:1229-1239)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tpch import DEFAULT_SF_DIR, register_views

# Tags are modeled as two scalar columns (tag1/tag2) because array
# literals are not dialect-portable; engine code builds array(tag1, tag2)
# where the reference has `list_tags`.
VAMS_VIEW_SQL: dict[str, str] = {
    # part -> assets. Keys are stable across scale factors (p_partkey is
    # dense 1..N); database assignment is a deterministic hash-mod so the
    # table is partitionable by database_id exactly as SURVEY §1.1 says.
    "assets": """
        SELECT
            'db_' || CAST(p_partkey % 20 AS STRING)          AS database_id,
            'asset_' || CAST(p_partkey AS STRING)            AS asset_id,
            p_name                                           AS asset_name,
            p_type                                           AS description,
            CASE p_partkey % 5 WHEN 0 THEN 'glb' WHEN 1 THEN 'gltf'
                 WHEN 2 THEN 'ifc' WHEN 3 THEN 'obj' ELSE 'las' END
                                                             AS asset_type,
            p_brand                                          AS tag1,
            CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS tag2,
            (p_partkey % 3 = 0)                              AS is_distributable,
            (p_partkey % 13 = 0)                             AS is_archived,
            'bucket_' || CAST(p_partkey % 5 AS STRING)       AS bucket_id,
            p_retailprice                                    AS asset_size
        FROM part
    """,
    # buckets dimension (tiny -> always broadcast).
    "buckets": """
        SELECT DISTINCT
            'bucket_' || CAST(p_partkey % 5 AS STRING)       AS bucket_id,
            'vams-bucket-' || CAST(p_partkey % 5 AS STRING)  AS bucket_name,
            'assets/'                                        AS base_assets_prefix
        FROM part
    """,
    # lineitem -> files (l_extendedprice -> file_size, l_shipdate ->
    # last_modified per FIXTURES.md §7). etag collides on purpose so the
    # exact-dedup operator has work to do.
    "files": """
        SELECT
            'db_' || CAST(l_partkey % 20 AS STRING)          AS database_id,
            'asset_' || CAST(l_partkey AS STRING)            AS asset_id,
            '/f/' || CAST(l_orderkey AS STRING) || '_'
                  || CAST(l_linenumber AS STRING) || '.'
                  || CASE l_linenumber % 5 WHEN 0 THEN 'glb' WHEN 1 THEN 'gltf'
                          WHEN 2 THEN 'png' WHEN 3 THEN 'ifc' ELSE 'obj' END
                                                             AS file_key,
            CASE l_linenumber % 5 WHEN 0 THEN 'glb' WHEN 1 THEN 'gltf'
                 WHEN 2 THEN 'png' WHEN 3 THEN 'ifc' ELSE 'obj' END
                                                             AS file_ext,
            CAST(FLOOR(l_extendedprice) AS BIGINT)           AS file_size,
            l_shipdate                                       AS last_modified,
            'etag_' || CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) % 1000 AS STRING)
                                                             AS etag,
            (l_orderkey % 17 = 0)                            AS is_archived
        FROM lineitem
    """,
    # orders -> metadata EAV rows attached to a stable asset-key range.
    # The asset modulus (199, odd) is coprime with the key-selector modulus
    # (4) so every asset accumulates all four metadata keys. Multiple
    # writers per (entity, key) are possible, like the reference's
    # last-write-wins stream; readers aggregate with max() (documented).
    "metadata": """
        SELECT
            'db_' || CAST((o_orderkey % 199 + 1) % 20 AS STRING) AS database_id,
            'asset_' || CAST(o_orderkey % 199 + 1 AS STRING)     AS asset_id,
            '/'                                                  AS file_path,
            CASE o_orderkey % 4 WHEN 0 THEN 'status' WHEN 1 THEN 'priority'
                 WHEN 2 THEN 'price_tier' ELSE 'order_date' END  AS metadata_key,
            CASE o_orderkey % 4
                 WHEN 0 THEN o_orderstatus
                 WHEN 1 THEN o_orderpriority
                 WHEN 2 THEN CASE WHEN o_totalprice > 100000
                                  THEN 'high' ELSE 'low' END
                 ELSE CAST(CAST(o_orderdate AS DATE) AS STRING) END
                                                                 AS metadata_value,
            CASE o_orderkey % 4 WHEN 3 THEN 'date' ELSE 'string' END
                                                                 AS metadata_value_type
        FROM orders
    """,
    # lineitem -> file-level metadata EAV (MD_ on file docs). The
    # reference's metadata table keys on databaseId:assetId:filePath with
    # filePath != '/' meaning file-level (metadataService.py:1460-1479,
    # assetIndexer.py:892-900); file docs expose it as the MD_ flat
    # object (models/indexing.py:154-172). Two keys per file via
    # UNION ALL; the 'frame_rate' leg covers only even orderkeys so the
    # left join has misses to exercise.
    "file_metadata": """
        SELECT
            'db_' || CAST(l_partkey % 20 AS STRING)          AS database_id,
            'asset_' || CAST(l_partkey AS STRING)            AS asset_id,
            '/f/' || CAST(l_orderkey AS STRING) || '_'
                  || CAST(l_linenumber AS STRING) || '.'
                  || CASE l_linenumber % 5 WHEN 0 THEN 'glb' WHEN 1 THEN 'gltf'
                          WHEN 2 THEN 'png' WHEN 3 THEN 'ifc' ELSE 'obj' END
                                                             AS file_key,
            'codec'                                          AS metadata_key,
            CASE l_suppkey % 4 WHEN 0 THEN 'h264' WHEN 1 THEN 'hevc'
                 WHEN 2 THEN 'av1' ELSE 'prores' END         AS metadata_value
        FROM lineitem
        UNION ALL
        SELECT
            'db_' || CAST(l_partkey % 20 AS STRING),
            'asset_' || CAST(l_partkey AS STRING),
            '/f/' || CAST(l_orderkey AS STRING) || '_'
                  || CAST(l_linenumber AS STRING) || '.'
                  || CASE l_linenumber % 5 WHEN 0 THEN 'glb' WHEN 1 THEN 'gltf'
                          WHEN 2 THEN 'png' WHEN 3 THEN 'ifc' ELSE 'obj' END,
            'frame_rate',
            CAST(CAST(FLOOR(l_quantity) AS BIGINT) % 60 + 1 AS STRING)
        FROM lineitem WHERE l_orderkey % 2 = 0
    """,
    # lineitem -> pipeline attributes EAV (AB_ on file docs): outputs of
    # workflow/pipeline runs attached to files
    # (processWorkflowExecutionOutput.py; models/indexing.py:174-192).
    # Sparse on purpose (every third order) — not all files have attrs.
    "file_attributes": """
        SELECT
            'db_' || CAST(l_partkey % 20 AS STRING)          AS database_id,
            'asset_' || CAST(l_partkey AS STRING)            AS asset_id,
            '/f/' || CAST(l_orderkey AS STRING) || '_'
                  || CAST(l_linenumber AS STRING) || '.'
                  || CASE l_linenumber % 5 WHEN 0 THEN 'glb' WHEN 1 THEN 'gltf'
                          WHEN 2 THEN 'png' WHEN 3 THEN 'ifc' ELSE 'obj' END
                                                             AS file_key,
            CASE l_suppkey % 2 WHEN 0 THEN 'pipeline_stage'
                 ELSE 'quality_score' END                    AS attribute_key,
            CASE l_suppkey % 2
                 WHEN 0 THEN 'stage_' || CAST(l_linenumber AS STRING)
                 ELSE CAST(CAST(l_discount AS DECIMAL(4,2)) AS STRING) END
                                                             AS attribute_value
        FROM lineitem WHERE l_orderkey % 3 = 0
    """,
    # part -> asset_links: deterministic edges. parentChild edges form a
    # descending chain 48→42→…→12→6 plus the closing edge 6→48 — a real
    # cycle, exercising the cycle detection the reference does in
    # assetLinksService.py:337-405. `related` edges are short-range links.
    "asset_links": """
        SELECT
            'link_' || CAST(p_partkey AS STRING)             AS asset_link_id,
            'db_' || CAST(p_partkey % 20 AS STRING)          AS from_database_id,
            'asset_' || CAST(p_partkey AS STRING)            AS from_asset_id,
            'db_' || CAST(
                (CASE WHEN p_partkey % 6 = 0
                      THEN (CASE WHEN p_partkey = 6 THEN 48 ELSE p_partkey - 6 END)
                      ELSE p_partkey % 50 + 1 END) % 20 AS STRING)
                                                             AS to_database_id,
            'asset_' || CAST(
                CASE WHEN p_partkey % 6 = 0
                     THEN (CASE WHEN p_partkey = 6 THEN 48 ELSE p_partkey - 6 END)
                     ELSE p_partkey % 50 + 1 END AS STRING)  AS to_asset_id,
            CASE WHEN p_partkey % 6 = 0 THEN 'parentChild' ELSE 'related' END
                                                             AS relationship_type
        FROM part
        WHERE p_partkey % 2 = 0 AND p_partkey <> p_partkey % 50 + 1
    """,
    # declared metadata schemas (MetadataSchemaStorageTableV2,
    # models/metadataSchema.py:19-93): field name, type, required,
    # controlled list. allowed_values is comma-delimited (array literals
    # are not dialect-portable). Drives the validation operator
    # (common/metadataSchemaValidation.py semantics).
    "metadata_schemas": """
        SELECT * FROM (VALUES
            ('status',     'assetMetadata', 'string', TRUE,
             'F,O'),
            ('priority',   'assetMetadata', 'string', TRUE,
             '1-URGENT,2-HIGH,3-MEDIUM'),
            ('price_tier', 'assetMetadata', 'string', TRUE,
             'high,low'),
            ('order_date', 'assetMetadata', 'date',   TRUE,
             CAST(NULL AS STRING))
        ) AS t(metadata_key, entity_type, value_type, required,
               allowed_values)
    """,
    # Typed-metadata fixture: every declared value type
    # (models/metadata.py:20-36) with planted valid AND invalid values —
    # drives the 13-type validation operator. VALUES literals parse
    # identically in Spark SQL and DuckDB; asset_t1 is fully valid,
    # asset_t2 carries one violation per type, asset_t3 exercises range/
    # structure edges and a missing required key.
    "typed_metadata": """
        SELECT * FROM (VALUES
            ('db_0', 'asset_t1', 'title',       'Lobby scan'),
            ('db_0', 'asset_t1', 'score',       '87.5'),
            ('db_0', 'asset_t1', 'visible',     'true'),
            ('db_0', 'asset_t1', 'captured_on', '2024-03-01T10:00:00Z'),
            ('db_0', 'asset_t1', 'extra',       '{"a": 1, "b": [1, 2]}'),
            ('db_0', 'asset_t1', 'position',    '{"x":1,"y":2.5,"z":-3}'),
            ('db_0', 'asset_t1', 'rotation',    '{"w":0,"x":1,"y":2,"z":3}'),
            ('db_0', 'asset_t1', 'transform',
             '[[1,0,0,0],[0,1,0,0],[0,0,1,0],[0,0,0,1]]'),
            ('db_0', 'asset_t1', 'location',
             '{"type":"Point","coordinates":[10.5,20.1]}'),
            ('db_0', 'asset_t1', 'footprint',
             '{"type":"FeatureCollection","features":[]}'),
            ('db_0', 'asset_t1', 'coords',
             '{"lat":45.0,"long":-122.5,"alt":100}'),
            ('db_0', 'asset_t1', 'category',    'interior'),
            ('db_0', 'asset_t2', 'score',       'abc'),
            ('db_0', 'asset_t2', 'visible',     'yes'),
            ('db_0', 'asset_t2', 'captured_on', 'not-a-date'),
            ('db_0', 'asset_t2', 'extra',       '{bad json'),
            ('db_0', 'asset_t2', 'position',    '{"x":1,"y":2}'),
            ('db_0', 'asset_t2', 'rotation',    '[1,2,3,4]'),
            ('db_0', 'asset_t2', 'transform',   '[[1,0],[0,1]]'),
            ('db_0', 'asset_t2', 'location',
             '{"type":"Polygon","coordinates":[]}'),
            ('db_0', 'asset_t2', 'footprint',   '{"type":"Banana"}'),
            ('db_0', 'asset_t2', 'coords',
             '{"lat":95,"long":0,"alt":0}'),
            ('db_0', 'asset_t2', 'category',    'underwater'),
            ('db_0', 'asset_t3', 'title',       ''),
            ('db_0', 'asset_t3', 'coords',
             '{"lat":0,"long":181,"alt":0}'),
            ('db_0', 'asset_t3', 'position',    '{"x":"a","y":1,"z":1}'),
            ('db_0', 'asset_t3', 'transform',   'not json')
        ) AS t(database_id, asset_id, metadata_key, metadata_value)
    """,
    # Declared schemas for the typed fixture (MetadataSchemaStorageTableV2
    # with the full MetadataValueType vocabulary, models/metadata.py:20-36).
    "typed_metadata_schemas": """
        SELECT * FROM (VALUES
            ('title',       'assetMetadata', 'string',                 FALSE, CAST(NULL AS STRING)),
            ('notes',       'assetMetadata', 'multiline_string',       FALSE, CAST(NULL AS STRING)),
            ('category',    'assetMetadata', 'inline_controlled_list', FALSE, 'interior,exterior'),
            ('score',       'assetMetadata', 'number',                 TRUE,  CAST(NULL AS STRING)),
            ('visible',     'assetMetadata', 'boolean',                FALSE, CAST(NULL AS STRING)),
            ('captured_on', 'assetMetadata', 'date',                   FALSE, CAST(NULL AS STRING)),
            ('extra',       'assetMetadata', 'json',                   FALSE, CAST(NULL AS STRING)),
            ('position',    'assetMetadata', 'xyz',                    FALSE, CAST(NULL AS STRING)),
            ('rotation',    'assetMetadata', 'wxyz',                   FALSE, CAST(NULL AS STRING)),
            ('transform',   'assetMetadata', 'matrix4x4',              FALSE, CAST(NULL AS STRING)),
            ('location',    'assetMetadata', 'geopoint',               FALSE, CAST(NULL AS STRING)),
            ('footprint',   'assetMetadata', 'geojson',                FALSE, CAST(NULL AS STRING)),
            ('coords',      'assetMetadata', 'lla',                    FALSE, CAST(NULL AS STRING))
        ) AS t(metadata_key, entity_type, value_type, required,
               allowed_values)
    """,
    # Raw ingest objects: URL-encoded S3 keys (fileIndexer.py:876),
    # gs_-style JSON metadata blobs (models/indexing.py:94-97) and messy
    # date strings (models/indexing.py:100-123) — drives the scalar
    # decode/extract/parse functions.
    "raw_objects": """
        SELECT * FROM (VALUES
            ('obj_1', 'assets%20v2/scan%2Bfinal.glb',
             '{"vendor":"acme","rev":3}', '2024-03-01T10:00:00.123456789'),
            ('obj_2', 'a+b/c.png',
             '{"vendor":"zenith","rev":12}', '2024-03-01 08:30:00'),
            ('obj_3', 'plain/file.obj',
             '{"nested":{"depth":7}}', '2024-02-29'),
            ('obj_4', 'x%2By.ifc', 'not json', 'not-a-date')
        ) AS t(object_id, s3_key, gs_blob, date_str)
    """,
    # Candidate edge batch for the create-link constraint checks
    # (createAssetLink.py:73-190): one row per violation class + two
    # insertable rows, crafted against known edges of the asset_links
    # view (48→42 parentChild exists; 2→3 related exists).
    "candidate_links": """
        SELECT * FROM (VALUES
            ('db_1', 'asset_1',   'db_1', 'asset_1',   'related',
             CAST(NULL AS STRING)),
            ('db_1', 'asset_21',  'db_2', 'asset_22',  'related',  'al1'),
            ('db_2', 'asset_2',   'db_3', 'asset_3',   'related',
             CAST(NULL AS STRING)),
            ('db_3', 'asset_3',   'db_2', 'asset_2',   'related',
             CAST(NULL AS STRING)),
            ('db_8', 'asset_48',  'db_2', 'asset_42',  'parentChild',
             CAST(NULL AS STRING)),
            ('db_8', 'asset_48',  'db_2', 'asset_42',  'parentChild', 'v2'),
            ('db_2', 'asset_42',  'db_8', 'asset_48',  'parentChild',
             CAST(NULL AS STRING)),
            ('db_1', 'asset_201', 'db_2', 'asset_202', 'related',
             CAST(NULL AS STRING))
        ) AS t(from_database_id, from_asset_id, to_database_id,
               to_asset_id, relationship_type, alias_id)
    """,
    # Registered workflows dimension (WorkflowStorageTable with the
    # autoTriggerOnFileExtensionsUpload field, sqsAutoExecuteWorkflow.py:
    # 99-174): '.all' triggers on anything, else a comma-delimited
    # lowercase extension list; empty/NULL never triggers.
    "workflows": """
        SELECT * FROM (VALUES
            ('wf_preview',  'db_1', 'glb,gltf'),
            ('wf_everything', 'db_1', '.all'),
            ('wf_thumbs',   'db_2', 'png'),
            ('wf_disabled', 'db_2', ''),
            ('wf_other_db', 'db_3', '.all')
        ) AS t(workflow_id, database_id, auto_trigger_extensions)
    """,
    # orders -> comments (CommentStorageTable, storageBuilder
    # -nestedStack.ts:687-697: hash key assetId, range key
    # "assetVersionId:commentId"). The engine keeps the composite range
    # key's parts as first-class columns; begins_with(assetVersionId)
    # listing (commentService.py:142) becomes an equality on
    # asset_version_id.
    "comments": """
        SELECT
            'db_' || CAST((o_orderkey % 199 + 1) % 20 AS STRING) AS database_id,
            'asset_' || CAST(o_orderkey % 199 + 1 AS STRING)     AS asset_id,
            'v' || CAST(o_orderkey % 3 + 1 AS STRING)            AS asset_version_id,
            'comment_' || CAST(o_orderkey AS STRING)             AS comment_id,
            'priority ' || o_orderpriority || ' follow-up'       AS comment_body,
            'user_' || CAST(o_custkey % 50 AS STRING)            AS comment_owner_id,
            CAST(CAST(o_orderdate AS DATE) AS STRING)            AS date_created
        FROM orders
    """,
    # part brands + size classes -> tags (TagStorageTable, storageBuilder
    # :1029-1043; rows match the tag values the assets view carries in
    # tag1/tag2). One orphan tag exercises the createTag.py:90 typed
    # referential check.
    "tags": """
        SELECT DISTINCT
            p_brand             AS tag_name,
            'brand ' || p_brand AS tag_description,
            'brand'             AS tag_type_name
        FROM part
        UNION ALL
        SELECT * FROM (VALUES
            ('large', 'assets over size 25', 'size'),
            ('small', 'assets size 25 and under', 'size'),
            ('orphan', 'tag with an undeclared type', 'missing_type')
        ) AS t(tag_name, tag_description, tag_type_name)
    """,
    # TagTypeStorageTable (storageBuilder :1029-1043): tiny dimension,
    # always broadcast. 'material' has no tags (LEFT-join miss case).
    "tag_types": """
        SELECT * FROM (VALUES
            ('brand',    'part brand family',  TRUE),
            ('size',     'size class',         FALSE),
            ('material', 'declared but unused', FALSE)
        ) AS t(tag_type_name, tag_type_description, required)
    """,
    # customer -> subscriptions (SubscriptionsStorageTable,
    # subscriptionService.py:96-101 splits the entityName_entityId key;
    # the subscribers list is normalized to one row per subscriber —
    # the relational form of the reference's list attribute).
    "subscriptions": """
        SELECT DISTINCT
            'Asset Version Change'                          AS event_name,
            'Asset'                                         AS entity_name,
            'db_' || CAST((c_custkey % 199 + 1) % 20 AS STRING) AS database_id,
            'asset_' || CAST(c_custkey % 199 + 1 AS STRING) AS entity_id,
            'user_' || CAST(c_custkey % 50 AS STRING) || '@example.com'
                                                            AS subscriber
        FROM customer WHERE c_custkey % 2 = 0
    """,
    # part -> databases dimension (DatabaseStorageTable,
    # createDatabase.py:59-68: databaseId, description, defaultBucketId,
    # restriction flags, assetCount, dateCreated). The stored assetCount
    # is a maintained counter in the reference; the engine computes it
    # live (q_vams_database_listing), so the view carries only intrinsic
    # attributes. Functional dependence on database_id keeps DISTINCT
    # exact.
    "databases": """
        SELECT DISTINCT
            'db_' || CAST(p_partkey % 20 AS STRING)              AS database_id,
            'database ' || CAST(p_partkey % 20 AS STRING)        AS description,
            'bucket_' || CAST((p_partkey % 20) % 5 AS STRING)    AS default_bucket_id,
            ((p_partkey % 20) % 2 = 0)       AS restrict_metadata_outside_schemas,
            ((p_partkey % 20) % 3 = 0)       AS restrict_file_uploads_to_extensions
        FROM part
    """,
    # RolesStorageTable (createRole.py) — tiny dimension; 'auditor' has
    # no members (LEFT-join miss case).
    "roles": """
        SELECT * FROM (VALUES
            ('admin',   'full control'),
            ('editor',  'create and modify assets'),
            ('viewer',  'read-only'),
            ('auditor', 'declared but unassigned')
        ) AS t(role_name, role_description)
    """,
    # customer -> user_roles (UserRolesStorageTable,
    # userRolesService.py:69-130: userId -> role names, normalized to
    # one row per (user, role)).
    "user_roles": """
        SELECT DISTINCT
            'user_' || CAST(c_custkey % 50 AS STRING)            AS user_id,
            CASE c_custkey % 3 WHEN 0 THEN 'admin'
                 WHEN 1 THEN 'editor' ELSE 'viewer' END          AS role_name
        FROM customer
    """,
    # PipelineStorageTable (createPipeline.py / enablePipeline.py):
    # registered per-database pipelines with an enabled toggle.
    "pipelines": """
        SELECT * FROM (VALUES
            ('pl_preview',   'db_1', 'preview-generation', TRUE),
            ('pl_metadata',  'db_1', 'metadata-extraction', TRUE),
            ('pl_voxelize',  'db_1', 'geometry', FALSE),
            ('pl_thumbs',    'db_2', 'preview-generation', TRUE),
            ('pl_disabled',  'db_2', 'geometry', FALSE),
            ('pl_other',     'db_3', 'metadata-extraction', TRUE)
        ) AS t(pipeline_id, database_id, pipeline_type, enabled)
    """,
    # AppFeatureEnabledStorageTable (configService.py:19-70: full scan
    # aggregated into the featuresEnabled response).
    "app_features": """
        SELECT * FROM (VALUES
            ('alpha-preview'), ('graph-view'), ('bulk-metadata'),
            ('comments'), ('export')
        ) AS t(feature_name)
    """,
    # Deterministic pseudo-partsupp: the driver fixture set has no
    # partsupp table (TESTDATA.md), which blocked the four TPC-H shapes
    # that need one (Q2 correlated min, Q11 having-over-total, Q16
    # distinct-count exclusion, Q20 semi-join over correlated sums).
    # Derive it the same way the VAMS star is derived from TPC-H tables:
    # one shared SELECT both engines evaluate identically. Shape follows
    # TPC-H (4 suppliers per part); ps_suppkey = (4*partkey + i) mod S
    # + 1 gives 4 DISTINCT suppliers per part for any S >= 4 and an
    # even ~4P/S parts-per-supplier spread; availqty/supplycost are
    # integer-hash formulas in the TPC-H value ranges (10..9999 and
    # 100.00..999.99) — exact in double on both engines.
    "partsupp": """
        SELECT ps_partkey, ps_suppkey,
               CAST((ps_partkey * 5 + ps_suppkey * 3) % 9990 + 10 AS INT)
                   AS ps_availqty,
               CAST(((ps_partkey * 7 + ps_suppkey * 13) % 90000) / 100.0
                    + 100.0 AS DOUBLE) AS ps_supplycost
        FROM (
            SELECT p_partkey AS ps_partkey,
                   (p_partkey * 4 + quad.i) % sc.s_cnt + 1 AS ps_suppkey
            FROM part
            CROSS JOIN (SELECT COUNT(*) AS s_cnt FROM supplier) AS sc
            CROSS JOIN (VALUES (0), (1), (2), (3)) AS quad(i)
        ) ps
    """,
    # lineitem -> asset_versions: one version row per (part, order); the
    # current version is the latest ship date (row_number pick, SURVEY §2.5).
    "asset_versions": """
        SELECT
            'db_' || CAST(l_partkey % 20 AS STRING)          AS database_id,
            'asset_' || CAST(l_partkey AS STRING)            AS asset_id,
            'v_' || CAST(l_orderkey AS STRING) || '_'
                 || CAST(l_linenumber AS STRING)             AS asset_version_id,
            l_shipdate                                       AS date_created,
            CAST(FLOOR(l_quantity) AS BIGINT)                AS file_count
        FROM lineitem
    """,
}


def register_vams_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register base tables + derived VAMS views as Spark temp views."""
    register_views(spark, sf_dir)
    for name, sql in VAMS_VIEW_SQL.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")


def oracle_with(*views: str) -> str:
    """Build the ``WITH`` prefix that inlines the named derived views for
    a DuckDB oracle query (base tables are pre-registered by the driver)."""
    if not views:
        return ""
    parts = [f"{name} AS ({VAMS_VIEW_SQL[name]})" for name in views]
    return "WITH " + ", ".join(parts) + "\n"
