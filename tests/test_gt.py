from worddiffusion_tpu.data.gt import WriterRegistry, parse_gt, sniff_format


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text, encoding="utf-8")
    return str(p)


def test_filter27(tmp_path):
    path = _write(
        tmp_path,
        "train.filter27",
        "537,m03-013-00-04 Lord\n537,m03-013-00-06 said\n120,a01-000-00-01 the\n",
    )
    samples, reg = parse_gt(path)
    assert sniff_format(path) == "filter27"
    assert samples[0].image == "m03-013-00-04.png"
    assert samples[0].writer == "537"
    assert samples[0].word == "Lord"
    assert len(reg) == 2 and reg["537"] == 0 and reg["120"] == 1


def test_nor_csv(tmp_path):
    path = _write(
        tmp_path,
        "nor.csv",
        "16,no-nb_digibok_2013060608065_0016_94.jpg,fjerde\n"
        "47,no-nb_digibok_2013060608065_0047_41.jpg,uagtet\n",
    )
    assert sniff_format(path) == "nor_csv"
    samples, reg = parse_gt(path)
    assert samples[0].word == "fjerde"
    assert samples[0].image.endswith(".jpg")
    assert len(reg) == 2


def test_icpr_csv(tmp_path):
    path = _write(
        tmp_path,
        "icpr.csv",
        "word_image,word,author\n"
        "fgaw001_2_000_0023_0026_0129_0085.jpg,saa,Gronvold_Aimar\n",
    )
    assert sniff_format(path) == "icpr_csv"
    samples, reg = parse_gt(path)
    assert samples[0].writer == "Gronvold_Aimar"
    assert samples[0].word == "saa"


def test_partial_load(tmp_path):
    lines = "\n".join(f"1,w-{i:03d} word{i}" for i in range(10))
    path = _write(tmp_path, "t.filter27", lines + "\n")
    samples, _ = parse_gt(path, partial_load=0.5)
    assert len(samples) == 5


def test_writer_registry_json(tmp_path):
    reg = WriterRegistry()
    reg.add("537")
    reg.add("120")
    p = tmp_path / "writers_dict_train.json"
    reg.dump_json(str(p))
    reg2 = WriterRegistry.from_json(str(p))
    assert reg2.mapping == {"537": 0, "120": 1}


def test_reference_gt_files_parse():
    # The real annotation corpus shipped with the reference.
    import os

    path = "/root/reference/gt/gan.iam.test.gt copy.filter27"
    if not os.path.exists(path):
        return
    samples, reg = parse_gt(path)
    assert len(samples) > 1000
    assert all(s.image.endswith(".png") for s in samples[:50])
