"""Orchestration entry point: table-definition path -> CREATE or ALTER.

Reference parity (no code copied) — end-to-end pipeline of
``/root/reference/lambda/handler.py:15-64`` +
``lambda_helper.py:27-43,138-159`` + ``iceberg_helper.py:197-245``:

  load config -> validate -> compile schema -> route on table existence
  (CREATE TABLE | ALTER TABLE) -> optional synthetic-data append ->
  persist response JSON.

Observable contract preserved: errors never raise; they accumulate in
``message_list`` with ``has_error`` (reference handler.py:50,59-64).
Deliberate fix: validation actually runs (the reference's
``_validate_schema`` is dead code, lambda_helper.py:45-79).
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path

from pyspark.sql import SparkSession

from .config import load_table_def, validate_table_def
from .datagen import insert_orders
from .evolution import evolve_table
from .partitioning import compile_partition_spec
from .response import ProcessSchemaResponse
from .schema_compiler import compile_schema
from .table_format import LakeCatalog


def process_event(
    spark: SparkSession,
    catalog: LakeCatalog,
    table_def_path: str,
    output_dir: str | Path | None = None,
    generate_data_version: str | None = None,
) -> ProcessSchemaResponse:
    """Process one table-definition document (the reference's Lambda
    event, handler.py:15-64). ``generate_data_version`` mirrors the
    reference's append-after-evolve for its known assets
    (handler.py:44-48: version sniffed as 'v1' if '1' in path)."""
    resp = ProcessSchemaResponse()
    ok, loaded = load_table_def(table_def_path)
    if not ok:
        resp.message_list.extend(loaded)  # type: ignore[arg-type]
        resp.has_error = True
        return _save_output(resp, output_dir)
    table_def = loaded  # type: ignore[assignment]

    valid, errs = validate_table_def(table_def)
    if not valid:
        resp.message_list.extend(errs)
        resp.has_error = True
        return _save_output(resp, output_dir)

    resp.database_name = table_def["database_name"]
    resp.table_name = table_def["table_name"]

    try:
        target_schema = compile_schema(table_def)
        target_spec = compile_partition_spec(table_def)
    except Exception as e:  # noqa: BLE001 — contract: accumulate, don't raise
        resp.message_list.append(f"Schema compile failed: {e}")
        resp.has_error = True
        return _save_output(resp, output_dir)

    db, tbl = resp.database_name, resp.table_name
    if not catalog.table_exists(db, tbl):
        # CREATE path (reference: iceberg_helper.py:226-245)
        resp.change_type = "CREATE TABLE"
        try:
            table = catalog.create_table(
                db, tbl, target_schema, target_spec,
                properties=table_def.get("properties") or {},
            )
            resp.message_list.append(
                f"Created table {db}.{tbl} at {table.location}"
            )
        except Exception as e:  # noqa: BLE001
            resp.message_list.append(f"Create failed: {e}")
            resp.has_error = True
            return _save_output(resp, output_dir)
    else:
        # ALTER path (reference: iceberg_helper.py:247-389)
        resp.change_type = "ALTER TABLE"
        table = catalog.load_table(db, tbl)
        result = evolve_table(
            table,
            target_schema,
            target_spec,
            renames=table_def.get("renames"),
        )
        resp.message_list.extend(result.messages)
        if result.has_error:
            resp.message_list.extend(result.errors)
            resp.has_error = True
            return _save_output(resp, output_dir)
        if not result.changed:
            resp.message_list.append("No schema changes detected")

    if generate_data_version:
        try:
            n = insert_orders(
                spark, catalog.load_table(db, tbl), generate_data_version
            )
            resp.message_list.append(f"Appended {n} generated rows")
        except Exception as e:  # noqa: BLE001
            resp.message_list.append(f"Data generation failed: {e}")
            resp.has_error = True

    return _save_output(resp, output_dir)


def _save_output(
    resp: ProcessSchemaResponse, output_dir: str | Path | None
) -> ProcessSchemaResponse:
    """Persist the response JSON. Reference behavior
    (lambda_helper.py:138-159): writes s3://bucket/output/{uuid}.json,
    records the location on the response, and on failure ACCUMULATES
    the error in message_list instead of raising. ``output_dir`` may
    be a local directory or an ``s3://bucket[/prefix]`` URI."""
    if output_dir is None:
        return resp
    body = json.dumps(json.loads(resp.to_json()), indent=1)
    dest = str(output_dir)
    if dest.startswith("s3://"):
        from urllib.parse import urlparse  # noqa: PLC0415

        u = urlparse(dest)
        key = f"{u.path.strip('/')}/{uuid.uuid4()}.json".lstrip("/")
        try:
            import boto3  # noqa: PLC0415

            boto3.client("s3").put_object(
                Bucket=u.netloc, Key=key, Body=body.encode("utf-8")
            )
            resp.output_location = f"s3://{u.netloc}/{key}"
        except Exception as e:  # noqa: BLE001 — reference accumulates
            resp.message_list.append(f"Failed to save output to s3: {e}")
            resp.output_location = f"Error saving output to S3: {e}"
        return resp
    out = Path(dest)
    out.mkdir(parents=True, exist_ok=True)
    loc = out / f"{uuid.uuid4()}.json"
    loc.write_text(body)
    resp.output_location = str(loc)
    return resp
