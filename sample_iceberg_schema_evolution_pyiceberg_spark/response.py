"""Result reporting dataclass.

Reference parity: ``ProcessSchemaResponse`` at
``/root/reference/lambda/process_schema_response.py:5-17`` —
``change_type`` is one of ``TBD`` / ``CREATE TABLE`` / ``ALTER TABLE``
(set at ``iceberg_helper.py:233,253``); errors accumulate in
``message_list`` with ``has_error`` (never raised out of the handler,
``handler.py:50,59-64``).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass
class ProcessSchemaResponse:
    database_name: str = ""
    table_name: str = ""
    change_type: str = "TBD"  # TBD | CREATE TABLE | ALTER TABLE
    message_list: list[str] = field(default_factory=list)
    output_location: str = ""
    has_error: bool = False

    def to_json(self) -> str:
        return json.dumps(asdict(self))
