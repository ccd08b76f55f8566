"""C14: granule-XML angle parsing — parse fidelity + end-to-end path parity."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from xcube_stac_spark import fixtures, synth
from xcube_stac_spark.plans import cube as cube_plan
from xcube_stac_spark.sources import angles as angles_src
from xcube_stac_spark.sources.catalog import SceneCatalog


def test_parse_reconstructs_dn_planes(sf0001_dir):
    """XML → nanmean over detectors → DN must equal the images-table DN
    planes bit-exactly (the synth sidecar encodes the same angles)."""
    t = pq.read_table(f"{sf0001_dir}/granule_xml.parquet").to_pandas()
    imgs = pq.read_table(f"{sf0001_dir}/images.parquet").to_pandas().set_index("image_id")
    assert len(t) > 0
    for r in t.head(8).itertuples(index=False):
        g = angles_src.parse_granule_xml(r.xml)
        assert g["res"] > 0 and g["proj_code"].startswith("EPSG:")
        for band in ("VZA", "VAA"):
            dn = angles_src._deg_to_dn(g["planes"][band])
            stored = np.frombuffer(
                bytes(imgs.loc[f"{r.item_id}:{band}"]["bytes"]), np.uint16
            ).reshape(dn.shape)
            assert np.array_equal(dn, stored), (r.item_id, band)


def test_parse_merges_detectors_with_nanmean():
    """Cells covered by one detector take its value; the overlap column is
    averaged (identical values here → unchanged); no NaN survives."""
    t = pq.read_table(f"{synth.generate('sf0.001')}/granule_xml.parquet").to_pandas()
    g = angles_src.parse_granule_xml(t.iloc[0]["xml"])
    for band in ("VZA", "VAA"):
        assert np.isfinite(g["planes"][band]).all()


def test_parse_rejects_missing_grids():
    xml = """<n1:Level-2A_Tile_ID xmlns:n1="x"><n1:Geometric_Info>
    <Tile_Geocoding><HORIZONTAL_CS_CODE>EPSG:32632</HORIZONTAL_CS_CODE>
    <Geoposition><ULX>1.0</ULX><ULY>2.0</ULY></Geoposition></Tile_Geocoding>
    <Tile_Angles></Tile_Angles></n1:Geometric_Info></n1:Level-2A_Tile_ID>"""
    with pytest.raises(ValueError, match="no Viewing_Incidence"):
        angles_src.parse_granule_xml(xml)


def test_xml_path_equals_images_path(spark, sf0001_dir):
    """The XML-parsed angle cube must be BIT-IDENTICAL to the images-table
    angle cube (same planes, same geo-referencing, same pipeline)."""
    cat = SceneCatalog(spark, sf0001_dir)
    grid = synth.default_grid("sf0.001")
    tr = ("2025-06-01", "2025-06-03")
    via_xml = {
        (str(r.solar_day), r.band, r.tile_y, r.tile_x): (r.n_scenes, r.item_ids, r.data)
        for r in angles_src.angles_cube_from_xml(cat, grid, tr, ["VZA", "VAA"]).collect()
    }
    via_imgs = {
        (str(r.solar_day), r.band, r.tile_y, r.tile_x): (r.n_scenes, r.item_ids, r.data)
        for r in cube_plan.build_cube(cat, grid, time_range=tr, bands=["VZA", "VAA"]).collect()
    }
    assert via_xml == via_imgs
    assert via_xml  # non-empty
