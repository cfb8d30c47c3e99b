"""Domain code tables (movement-type ids, package codes, org types).

The reference embeds these as giant IN-lists inside SQL strings (SURVEY §2.2 P7); the
rebuild centralizes them so they can be broadcast, documented, and tested.  Every list
cites its source lines in /root/reference/src/alertas/.
"""

# -- documentos_ativos (jobs.py:205-245) -------------------------------------
ARCHIVE_ORGS = (200819, 100500)  # jobs.py:209

PCT_TUTELA = tuple(range(20, 34)) + (180, 181, 182, 183)  # jobs.py:214

ARQUIVAMENTO_TUTELA = (  # jobs.py:215-225
    7912, 6548, 6326, 6681, 6678, 6645, 6682, 6680, 6679,
    6644, 6668, 6666, 6665, 6669, 6667, 6664, 6655, 6662,
    6659, 6658, 6663, 6661, 6660, 6657, 6670, 6676, 6674,
    6673, 6677, 6675, 6672, 6018, 6341, 6338, 6019, 6017,
    6591, 6339, 6553, 7871, 6343, 6340, 6342, 6021, 6334,
    6331, 6022, 6020, 6593, 6332, 7872, 6336, 6333, 6335,
    7745, 6346, 6345, 6015, 6016, 6325, 6327, 6328, 6329,
    6330, 6337, 6344, 6656, 6671, 7869, 7870, 6324, 7834,
    7737, 6350, 6251, 6655, 6326,
)

ARQUIVAMENTO_PIP = (  # jobs.py:228-233 (cod_pct >= 200)
    6682, 6669, 6018, 6341, 6338, 6019, 6017, 6591, 6339,
    7871, 6343, 6340, 6342, 7745, 6346, 7915, 6272, 6253,
    6392, 6377, 6378, 6359, 6362, 6361, 6436, 6524, 7737,
    7811, 6625, 6718, 7834, 6350,
)

# -- BDPA (alerta_bdpa.py) ----------------------------------------------------
BAIXA_IDS = (6006, 6010, 6363, 6494, 6495, 6519, 6520, 6521, 6522, 6523)  # bdpa:55
POLICE_ORG_TYPES = (60, 61, 68)  # bdpa:85

# -- DCTJ / DNTJ (alerta_dctj.py / alerta_dntj.py) ----------------------------
COURT_ORG_TYPES = (63, 64, 65, 66, 67, 69, 70, 83)  # dctj:132
MP_PARTY_ROLE = 7        # dctj:124
INTERNAL_ORG_TYPE = 1    # dctj:130

# -- deadline-family alerts ---------------------------------------------------
IC1A_PRORROGACAO = (6291,)                    # ic1a:28
IC1A_INSTAURACAO = (6511, 6012, 6002)         # ic1a:29
PA1A_PRORROGACAO = (6291,)                    # pa1a:108
PA1A_INSTAURACAO = (6013,)                    # pa1a:109
PPFP_PRORROGACAO = (6291,)                    # ppfp:177
PPFP_AUTUACAO = (6011,)                       # ppfp:178
NF30_CONVERSAO = (6011, 6012, 6013, 6014, 6251, 6252, 6253, 6259, 6260,
                  6516, 6533, 6556, 6567, 6628)        # nf30:256
NF30_PRORROGACAO = (6291, 7282, 7283)                   # nf30:257
NF30_AUTUACAO = (6034, 6631, 7751, 7752, 6035, 7754, 7753, 6007, 6632)  # nf30:258
LINKED_DOC_TYPES = (2, 6)                               # pa1a:125 / ic1a:48 corr_tpco_dk

# -- DT2I (alerta_dt2i.py:89-94) ----------------------------------------------
CIENCIA_IDS = (6374, 6375, 6376, 6377, 6378)
RECURSO_IDS = (
    6449, 6451, 6453, 6454, 6455, 6456, 6457, 6458, 6459, 6460, 6461, 6462,
    6463, 6464, 6465, 6466, 6467, 6468, 6470, 6471, 6472, 6473, 6474, 6475,
    6476, 6477, 6478, 6479, 6529, 6530, 6554, 6555, 7824, 7825, 7850,
)

# -- OFFP / OUVI / DORD ---------------------------------------------------------
OFICIO_ID = 6497          # offp:184
OUVIDORIA_DOC_TYPE = 119  # ouvi:108
GUIA_TYPE_REMESSA = 2     # ouvi:111
ORGAO_UPDATE_TYPE = 2     # dord:135 pcao_tpsa_dk

# -- MVVD (alerta_mvvd.py) -------------------------------------------------------
VICTIM_ROLES = (3, 290)          # mvvd:31
DOMESTIC_VIOLENCE_MATTER = 43    # mvvd:35
CPF_PLACEHOLDER = "00000000000"  # mvvd:55

# -- PRCR (alerta_prcr.py) --------------------------------------------------------
PIP_PACKAGES = tuple(range(200, 210))  # prcr:44
ACCUSED_ROLES = (290, 7, 21, 317, 20, 14, 32, 345, 40, 5, 24)  # prcr:96
MINOR_VICTIM_ROLES = (3, 13, 18, 6, 248, 290)                  # prcr:141
ANPP_RESCISSION = 7920                                          # prcr:118

# -- ISPS (alerta_isps.py) ----------------------------------------------------------
ISPS_PACKAGES = (20, 21, 22, 24, 28, 183)  # isps:242
STATE_COD_MUN = 33                          # isps:134
