"""Taxonomy pipeline tests (accession join, lineage walk, targets.txt)."""

from types import SimpleNamespace

from cuclark_tpu.taxonomy import ncbi
from cuclark_tpu.taxonomy.targets import set_targets


def write_taxonomy(tmp_path):
    # tiny taxonomy: 1 root, 2=bacteria(phylum), 10=genusA, 11=speciesA1,
    # 12=speciesA2, 20=genusB, 21=speciesB1
    (tmp_path / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "2\t|\t1\t|\tphylum\t|\n"
        "10\t|\t2\t|\tgenus\t|\n"
        "11\t|\t10\t|\tspecies\t|\n"
        "12\t|\t10\t|\tspecies\t|\n"
        "20\t|\t2\t|\tgenus\t|\n"
        "21\t|\t20\t|\tspecies\t|\n"
    )
    (tmp_path / "names.dmp").write_text(
        "10\t|\tGenusA\t|\t\t|\tscientific name\t|\n"
        "11\t|\tSpecies A1\t|\t\t|\tscientific name\t|\n"
        "12\t|\tSpecies A2\t|\t\t|\tscientific name\t|\n"
        "20\t|\tGenusB\t|\t\t|\tscientific name\t|\n"
        "21\t|\tSpecies B1\t|\t\t|\tscientific name\t|\n"
    )
    (tmp_path / "merged.dmp").write_text("99\t|\t21\t|\n")
    (tmp_path / "nucl.accession2taxid").write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "NC_0001\tNC_0001.1\t11\t1\n"
        "NC_0002\tNC_0002.1\t12\t2\n"
        "NC_0003\tNC_0003.1\t99\t3\n"  # merged -> 21
    )


def test_lineage_walk(tmp_path):
    write_taxonomy(tmp_path)
    parent, rank = ncbi.load_nodes(tmp_path / "nodes.dmp")
    ranks = ncbi.lineage_ranks(11, parent, rank)
    assert ranks == {"species": 11, "genus": 10, "phylum": 2}


def test_accession_join_with_merged(tmp_path):
    write_taxonomy(tmp_path)
    merged = ncbi.load_merged(tmp_path / "merged.dmp")
    got = ncbi.accession_to_taxid(
        {"NC_0001", "NC_0003"}, [tmp_path / "nucl.accession2taxid"], merged
    )
    assert got == {"NC_0001": 11, "NC_0003": 21}


def test_first_accession(tmp_path):
    g = tmp_path / "g.fa"
    g.write_text(">NC_0001.1 Some organism\nACGT\n")
    assert ncbi.first_accession(g) == "NC_0001"
    g.write_text(">gi|123|ref|NC_0042.3|\nACGT\n")
    assert ncbi.first_accession(g) == "NC_0042"


def test_set_targets_species_and_genus(tmp_path):
    write_taxonomy(tmp_path)
    refs = tmp_path / "refs"
    refs.mkdir()
    for acc, name in [("NC_0001", "a1"), ("NC_0002", "a2"), ("NC_0003", "b1")]:
        (refs / f"{name}.fna").write_text(f">{acc}.1 x\nACGTACGT\n")
    db_dir = tmp_path / "db_species"
    rc = set_targets(SimpleNamespace(
        db_dir=str(db_dir), ref_dirs=[str(refs)], rank="species",
        taxonomy_dir=str(tmp_path),
    ))
    assert rc == 0
    lines = (db_dir / "targets.txt").read_text().splitlines()
    labels = {l.split()[1] for l in lines}
    assert labels == {"Species_A1", "Species_A2", "Species_B1"}

    db_dir2 = tmp_path / "db_genus"
    set_targets(SimpleNamespace(
        db_dir=str(db_dir2), ref_dirs=[str(refs)], rank="genus",
        taxonomy_dir=str(tmp_path),
    ))
    labels = {l.split()[1]
              for l in (db_dir2 / "targets.txt").read_text().splitlines()}
    assert labels == {"GenusA", "GenusB"}


def test_set_targets_custom(tmp_path):
    refs = tmp_path / "refs"
    refs.mkdir()
    (refs / "x.fa").write_text(">s\nACGT\n")
    db_dir = tmp_path / "db"
    rc = set_targets(SimpleNamespace(
        db_dir=str(db_dir), ref_dirs=[str(refs)], rank="custom",
        taxonomy_dir=None,
    ))
    assert rc == 0
    assert (db_dir / "targets.txt").read_text().split()[1] == "x"


def test_settings_enforced_at_classify(tmp_path):
    """set-targets writes .settings; classify refuses a conflicting -T
    and uses the recorded targets for implicit builds
    (classify_metagenome.sh:60-87 parity)."""
    import random

    from cuclark_tpu.cli import main

    rng = random.Random(17)
    ref = tmp_path / "refs"
    ref.mkdir()
    g = "".join(rng.choice("ACGT") for _ in range(2500))
    (ref / "org1.fa").write_text(f">org1\n{g}\n")
    db_dir = tmp_path / "db"
    rc = main(["set-targets", str(db_dir), str(ref), "--rank", "custom"])
    assert rc == 0
    assert (db_dir / ".settings").exists()

    (tmp_path / "r.fq").write_text(
        f"@r0\n{g[100:200]}\n+\n{'I' * 100}\n")
    # conflicting -T refused
    other = tmp_path / "other_targets.txt"
    other.write_text(f"{ref}/org1.fa X1\n")
    rc = main(["classify", "-D", str(db_dir), "-T", str(other),
               "-O", str(tmp_path / "r.fq"), "-R", str(tmp_path / "o.csv")])
    assert rc == 1
    # no -T: implicit build from the recorded targets
    rc = main(["classify", "-D", str(db_dir),
               "-O", str(tmp_path / "r.fq"), "-R", str(tmp_path / "o.csv")])
    assert rc == 0
    rows = (tmp_path / "o.csv").read_text().splitlines()
    assert rows[1].split(",")[3] == "org1"
