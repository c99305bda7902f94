#!/usr/bin/env python3
"""Generate deterministic synthetic AF3 job-bundle fixtures (FIXTURES.md A)
under src/test/resources/af3/, plus independently-computed expected outputs
(expected_*.csv) used by the ScalaTest specs and the DuckDB oracle.

The expected values are computed here from first principles (plain python,
no BioPython) following the semantics documented in SURVEY.md — this is an
independent oracle, not a copy of the reference implementation.

Fixture design (hand-checkable):
  job_binder : passes the gate; chains A (12 AA) + B (14 AA + 1 LIG/4
               atoms) => chain_lengths [12, 18], N=30 tokens.
               PAE: 25.0 everywhere except pae[i][j]=5.0 for i in 0..7,
               j in {13..17, 19, 25} => interacting partner residues
               (j-12+1) = {2,3,4,5,6,8,14}; islands(gap=1,min=3) => [2..6].
               Geometry: partner residues 2..6 sit 5 A above POI residues
               r+1 => contacts union {2..8}; islands(gap=2,min=3) => [2..8].
               Report row: contact 2-8 seq CDEFGHI, interacting 2-6 seq RSTVW.
  job_weak   : chain_pair_pae_min[0][1] = 20 >= 15 => not a binder.
  job_corrupt: malformed summary JSON => not a binder.
"""
import json, math, os, csv

ROOT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "af3")

AA3 = {"A": "ALA", "C": "CYS", "D": "ASP", "E": "GLU", "F": "PHE", "G": "GLY",
       "H": "HIS", "I": "ILE", "K": "LYS", "L": "LEU", "M": "MET", "N": "ASN",
       "P": "PRO", "Q": "GLN", "R": "ARG", "S": "SER", "T": "THR", "V": "VAL",
       "W": "TRP", "Y": "TYR"}

CHAIN_A_SEQ = "ACDEFGHIKLMN"          # 12 POI residues
CHAIN_B_SEQ = "QRSTVWYACDEFGH"        # 14 partner residues (+ LIG below)

HEADER = """data_{name}
#
loop_
_atom_site.group_PDB
_atom_site.id
_atom_site.type_symbol
_atom_site.label_atom_id
_atom_site.label_alt_id
_atom_site.label_comp_id
_atom_site.label_asym_id
_atom_site.label_entity_id
_atom_site.label_seq_id
_atom_site.pdbx_PDB_ins_code
_atom_site.Cartn_x
_atom_site.Cartn_y
_atom_site.Cartn_z
_atom_site.occupancy
_atom_site.B_iso_or_equiv
_atom_site.auth_seq_id
_atom_site.auth_asym_id
_atom_site.pdbx_PDB_model_num
"""


def atoms_for_model(jitter: float):
    """Returns list of atom dicts for one model."""
    atoms = []
    # POI chain A: residue i (1-based) at x=(i-1)*4, two atoms N/CA.
    for i, aa in enumerate(CHAIN_A_SEQ, start=1):
        x = (i - 1) * 4.0 + jitter
        for k, an in enumerate(["N", "CA"]):
            atoms.append(dict(grp="ATOM", atom=an, res=AA3[aa], chain="A",
                              res_id=i, x=x + 0.1 * k, y=0.0, z=0.0))
    # partner chain B: residues 2..6 near POI (y=5); others far (y=100).
    for i, aa in enumerate(CHAIN_B_SEQ, start=1):
        y = 5.0 if 2 <= i <= 6 else 100.0
        x = i * 4.0 + jitter
        for k, an in enumerate(["N", "CA"]):
            atoms.append(dict(grp="ATOM", atom=an, res=AA3[aa], chain="B",
                              res_id=i, x=x + 0.1 * k, y=y, z=0.0))
    # one non-AA ligand in chain B, 4 atoms, far away; primed atom names
    # (C1'..C4') exercise the CIF quoted-token path ("C1'" in the file)
    for k in range(4):
        atoms.append(dict(grp="HETATM", atom=f"C{k+1}'", res="LIG", chain="B",
                          res_id=15, x=200.0 + k, y=200.0, z=0.0))
    return atoms


def cif_token(t):
    """Quote a CIF token the way mmCIF requires (BioPython MMCIFIO)."""
    if "'" in t:
        return f'"{t}"'
    if any(c.isspace() for c in t) or t == "":
        return f"'{t}'"
    return t


def write_cif(path, name, jitter):
    lines = [HEADER.format(name=name)]
    for n, a in enumerate(atoms_for_model(jitter), start=1):
        lines.append(
            f"{a['grp']} {n} {a['atom'][0]} {cif_token(a['atom'])} . {a['res']} {a['chain']} 1 "
            f"{a['res_id']} ? {a['x']:.3f} {a['y']:.3f} {a['z']:.3f} 1.00 50.00 "
            f"{a['res_id']} {a['chain']} 1\n")
    lines.append("#\n")
    with open(path, "w") as f:
        f.write("".join(lines))


def make_pae():
    n = 30
    pae = [[25.0] * n for _ in range(n)]
    for j in [13, 14, 15, 16, 17, 19, 25]:
        for i in range(8):
            pae[i][j] = 5.0
    return pae


def islands(nums, max_gap, min_len):
    nums = sorted(nums)
    groups, group = [], []
    for x in nums:
        if not group or x - group[-1] <= max_gap:
            group.append(x)
        else:
            if len(group) >= min_len:
                groups.append(group)
            group = [x]
    if len(group) >= min_len:
        groups.append(group)
    return groups


def main():
    os.makedirs(ROOT, exist_ok=True)
    # --- job_binder -----------------------------------------------------
    jb = os.path.join(ROOT, "job_binder")
    os.makedirs(jb, exist_ok=True)
    with open(os.path.join(jb, "job_binder_summary_confidences_0.json"), "w") as f:
        json.dump({"iptm": 0.85, "ptm": 0.80,
                   "chain_pair_pae_min": [[0.5, 3.0], [3.1, 0.6]]}, f)
    pae = make_pae()
    with open(os.path.join(jb, "job_binder_full_data_0.json"), "w") as f:
        json.dump({"pae": pae, "token_res_ids": list(range(1, 31))}, f)
    for m in range(5):
        write_cif(os.path.join(jb, f"job_binder_model_{m}.cif"),
                  f"job_binder_model_{m}", jitter=0.01 * m)

    # AppleDouble junk sibling: discovered but always skipped (py:560-566)
    with open(os.path.join(jb, "._job_binder_summary_confidences_0.json"), "wb") as f:
        f.write(b"\x00\x05\x16\x07 appledouble junk")

    # --- job_weak -------------------------------------------------------
    jw = os.path.join(ROOT, "job_weak")
    os.makedirs(jw, exist_ok=True)
    with open(os.path.join(jw, "job_weak_summary_confidences_0.json"), "w") as f:
        json.dump({"iptm": 0.85, "ptm": 0.80,
                   "chain_pair_pae_min": [[0.5, 20.0], [20.1, 0.6]]}, f)

    # --- job_corrupt ----------------------------------------------------
    jc = os.path.join(ROOT, "job_corrupt")
    os.makedirs(jc, exist_ok=True)
    with open(os.path.join(jc, "job_corrupt_summary_confidences_0.json"), "w") as f:
        f.write('{"iptm": 0.9, "ptm": ')  # truncated JSON

    # --- job_latin1: latin-1-encoded summary (py:71-73 fallback) --------
    jl = os.path.join(ROOT, "job_latin1")
    os.makedirs(jl, exist_ok=True)
    with open(os.path.join(jl, "job_latin1_summary_confidences_0.json"), "w",
              encoding="latin-1") as f:
        json.dump({"iptm": 0.9, "ptm": 0.85,
                   "chain_pair_pae_min": [[0.4, 2.5], [2.6, 0.5]],
                   "note": "café résumé"}, f, ensure_ascii=False)

    # --- expected outputs (independent computation) ---------------------
    # atoms of job_binder model_0
    with open(os.path.join(ROOT, "expected_atoms_model0.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["chain", "res_id", "res_name", "atom_name", "x", "y", "z",
                    "ordinal", "group_pdb", "type_symbol", "alt_id",
                    "label_asym_id", "entity_id", "label_seq_id", "ins_code",
                    "occupancy", "b_iso"])
        for n, a in enumerate(atoms_for_model(0.0), start=1):
            w.writerow([a["chain"], a["res_id"], a["res"], a["atom"],
                        f"{a['x']:.3f}", f"{a['y']:.3f}", f"{a['z']:.3f}",
                        n, a["grp"], a["atom"][0], ".", a["chain"], 1,
                        a["res_id"], "?", "1.00", "50.00"])

    # chain info
    with open(os.path.join(ROOT, "expected_chain_info.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["chain", "residue_length", "sequence"])
        w.writerow(["A", 12, CHAIN_A_SEQ])
        w.writerow(["B", 14 + 4, CHAIN_B_SEQ + "X"])

    # interacting residues: count over i in [0,12) of pae[i][j] < 15 >= 5
    chain_lengths = [12, 18]
    sp, ep = sum(chain_lengths[:1]), sum(chain_lengths[:1]) + chain_lengths[1]
    interacting = []
    for j in range(sp, ep):
        hits = sum(1 for i in range(0, 12) if pae[i][j] < 15.0)
        if hits >= 5:
            interacting.append(j - sp + 1)
    with open(os.path.join(ROOT, "expected_interacting.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["partner_res"])
        for r in interacting:
            w.writerow([r])

    # contact map: brute-force distance <= 8 between atoms of interacting
    # AA partner residues and AA POI atoms
    model0 = atoms_for_model(0.0)
    poi_atoms = [a for a in model0 if a["chain"] == "A" and a["res"] in AA3.values()]
    contacts = {}
    for a in model0:
        if a["chain"] == "B" and a["res"] in AA3.values() and a["res_id"] in interacting:
            for p in poi_atoms:
                d = math.dist((a["x"], a["y"], a["z"]), (p["x"], p["y"], p["z"]))
                if d <= 8.0:
                    contacts.setdefault(a["res_id"], set()).add(p["res_id"])
    with open(os.path.join(ROOT, "expected_contacts.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["partner_res", "poi_res"])
        for pr in sorted(contacts):
            for cr in sorted(contacts[pr]):
                w.writerow([pr, cr])

    # islands + report
    poi_seq, partner_seq = CHAIN_A_SEQ, CHAIN_B_SEQ + "X"
    rows = []
    for grp in islands(sorted(contacts.keys()), 1, 3):
        union = set()
        for k in grp:
            union |= contacts[k]
        for cg in islands(sorted(union), 2, 3):
            rows.append(["job_binder",
                         f"{min(cg)}-{max(cg)}", poi_seq[min(cg) - 1:max(cg)],
                         f"{min(grp)}-{max(grp)}", partner_seq[min(grp) - 1:max(grp)]])
    with open(os.path.join(ROOT, "expected_report.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["folder_name", "contact_residues_poi", "contact_sequence",
                    "interacting_residues_partner", "interacting_sequence"])
        w.writerows(rows)
    print("interacting:", interacting)
    print("contacts:", {k: sorted(v) for k, v in sorted(contacts.items())})
    print("report rows:", rows)


if __name__ == "__main__":
    main()
