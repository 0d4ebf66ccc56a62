"""Multi-program GenAI bundles (.aeqb): the .litertlm analog.

A bundle packs several models (embedder / prefill / decode / ...) as named
sections, each tagged with a `model_type` so per-model-type recipe mappings
select the right quantization per program.

Format: magic + JSON section table + 64-byte-aligned concatenated .aeqg
payloads.

Parity: reference `utils/litertlm_utils.py` + the aeq.py .litertlm flow.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
from typing import Optional

from ai_edge_quantizer_tpu.graph import ir
from ai_edge_quantizer_tpu.graph import serialize

_MAGIC = b'AEQB'
_ALIGN = 64


@dataclasses.dataclass
class BundleSection:
  name: str
  model_type: str  # e.g. 'embedder', 'prefill', 'decode'
  graph: ir.Graph


@dataclasses.dataclass
class Bundle:
  sections: list
  metadata: dict = dataclasses.field(default_factory=dict)

  def section_by_name(self, name: str) -> BundleSection:
    for s in self.sections:
      if s.name == name:
        return s
    raise KeyError(f'No bundle section {name!r}.')

  def save(self, path: str) -> None:
    blobs = []
    table = []
    offset = 0
    tmpdir = tempfile.mkdtemp()
    try:
      for i, sec in enumerate(self.sections):
        tmp = os.path.join(tmpdir, f'sec{i}.aeqg')
        serialize.save_graph(sec.graph, tmp)
        with open(tmp, 'rb') as f:
          blob = f.read()
        pad = (-offset) % _ALIGN
        offset += pad
        table.append({
            'name': sec.name,
            'model_type': sec.model_type,
            'offset': offset,
            'length': len(blob),
        })
        blobs.append(b'\x00' * pad + blob)
        offset += len(blob)
    finally:
      for f in os.listdir(tmpdir):
        os.unlink(os.path.join(tmpdir, f))
      os.rmdir(tmpdir)
    header = json.dumps(
        {'sections': table, 'metadata': self.metadata}).encode('utf-8')
    with open(path, 'wb') as f:
      f.write(_MAGIC)
      f.write(len(header).to_bytes(8, 'little'))
      f.write(header)
      base = f.tell()
      pad = (-base) % _ALIGN
      f.write(b'\x00' * pad)
      for blob in blobs:
        f.write(blob)

  @classmethod
  def load(cls, path: str) -> 'Bundle':
    with open(path, 'rb') as f:
      data = f.read()
    if data[:4] != _MAGIC:
      raise ValueError(f'{path} is not an .aeqb bundle.')
    hlen = int.from_bytes(data[4:12], 'little')
    header = json.loads(data[12:12 + hlen].decode('utf-8'))
    base = 12 + hlen
    base += (-base) % _ALIGN
    sections = []
    tmpdir = tempfile.mkdtemp()
    try:
      for i, entry in enumerate(header['sections']):
        blob = data[base + entry['offset']:
                    base + entry['offset'] + entry['length']]
        tmp = os.path.join(tmpdir, f'sec{i}.aeqg')
        with open(tmp, 'wb') as f:
          f.write(blob)
        sections.append(BundleSection(
            name=entry['name'], model_type=entry['model_type'],
            graph=serialize.load_graph(tmp)))
    finally:
      for fn in os.listdir(tmpdir):
        os.unlink(os.path.join(tmpdir, fn))
      os.rmdir(tmpdir)
    return cls(sections=sections, metadata=header.get('metadata', {}))


def quantize_bundle(
    bundle: Bundle,
    recipe_mapping: dict,
    calibration_data_per_section: Optional[dict] = None,
) -> Bundle:
  """Quantize every section with its model_type's recipe.

  recipe_mapping: {model_type: recipe list}; 'default' is the fallback; a
  missing entry (and no default) leaves the section float.
  """
  from ai_edge_quantizer_tpu import quantizer as quantizer_lib

  out_sections = []
  for sec in bundle.sections:
    recipe = recipe_mapping.get(sec.model_type,
                                recipe_mapping.get('default'))
    if recipe is None:
      out_sections.append(sec)
      continue
    qt = quantizer_lib.Quantizer(sec.graph, recipe)
    calibration_result = None
    if qt.need_calibration:
      data = (calibration_data_per_section or {}).get(sec.name)
      if data is None:
        raise ValueError(
            f'Section {sec.name!r} ({sec.model_type}) needs calibration '
            'data.')
      calibration_result = qt.calibrate(data)
    result = qt.quantize(calibration_result)
    out_sections.append(dataclasses.replace(
        sec, graph=result.quantized_model))
  return Bundle(sections=out_sections, metadata=dict(bundle.metadata))
