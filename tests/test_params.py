"""Parameter schema tests (mirrors libgadget/tests param behaviors)."""

import pytest

from mpgadget_tpu.params import (create_gadget_parameter_set,
                                 create_genic_parameter_set,
                                 parse_output_list, WIND_MODELS)
from mpgadget_tpu.utils.paramset import ParameterSet, REQUIRED, OPTIONAL


def test_defaults():
    ps = create_gadget_parameter_set()
    assert ps.get("Asmth") == 1.5
    assert ps.get("TreeRcut") == 6
    assert ps.get("ErrTolForceAcc") == 0.002
    assert ps.get("DensityKernelType") == 2  # quintic


def test_parse_reference_style_file():
    ps = create_gadget_parameter_set()
    ps.parse_string("""
# comment
InitCondFile = /tmp/IC
OutputDir = /tmp/out
OutputList = 0.1,0.5,1.0
TimeLimitCPU = 430000
Omega0 = 0.2814      # matter density
OmegaLambda = 0.7186
HubbleParam = 0.697
CoolingOn = 0
StarformationOn = 0
WindOn = 0
SnapshotWithFOF = 0
BlackHoleOn = 0
MetalReturnOn = 0
MassiveNuLinRespOn = 0
DensityIndependentSphOn = 1
Nmesh = 128
""")
    ps.validate()
    assert ps.get("Omega0") == 0.2814
    assert ps.get("Nmesh") == 128
    assert parse_output_list(ps.get("OutputList")) == [0.1, 0.5, 1.0]


def test_unknown_param_rejected():
    ps = create_gadget_parameter_set()
    with pytest.raises(KeyError):
        ps.parse_string("NotAParam = 3")


def test_missing_required_rejected():
    ps = create_gadget_parameter_set()
    ps.parse_string("InitCondFile = /tmp/IC")
    with pytest.raises(ValueError):
        ps.validate()


def test_enum_flags():
    ps = create_gadget_parameter_set()
    ps.set("WindModel", "sh03")
    assert ps.get("WindModel") == WIND_MODELS["sh03"]
    ps.set("WindModel", "halo, decouple")
    assert ps.get("WindModel") == WIND_MODELS["ofjt10"]
    ps.set("BlackHoleFeedbackMethod", "spline, mass")
    assert ps.get("BlackHoleFeedbackMethod") == 0x4 | 0x8


def test_genic_schema():
    ps = create_genic_parameter_set()
    ps.parse_string("""
FileWithInputSpectrum = /tmp/pk.txt
OutputDir = /tmp/ics
FileBase = IC
Omega0 = 0.2814
OmegaBaryon = 0.0464
OmegaLambda = 0.7186
HubbleParam = 0.697
ProduceGas = 0
BoxSize = 32000
Redshift = 99
Ngrid = 32
Seed = 181170
""")
    ps.validate()
    assert ps.get("Ngrid") == 32
    assert ps.get("UnitaryAmplitude") == 1


def test_classic_whitespace_syntax():
    """Classic gadget 'key  value' files (no equals) also parse."""
    ps = ParameterSet()
    ps.declare_double("A", OPTIONAL, 1.0, "")
    ps.declare_string("B", OPTIONAL, "", "")
    ps.parse_string("A 2.5\nB hello\n")
    assert ps.get("A") == 2.5
    assert ps.get("B") == "hello"
