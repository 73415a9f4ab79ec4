"""RDF Data Cube / RDF(S) / SKOS / OWL vocabulary constants.

Mirrors the interned term dictionary of the reference validator
(/root/reference/src/main/java/cn/yyz/nospa/validator/nonsparql/ValidatorBase.java:295-372)
as plain module-level strings.  Predicates are hot columns in the triple
table and benefit from Arrow dictionary encoding downstream.
"""

PREFIX_CUBE = "http://purl.org/linked-data/cube#"
PREFIX_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
PREFIX_RDFS = "http://www.w3.org/2000/01/rdf-schema#"
PREFIX_SKOS = "http://www.w3.org/2004/02/skos/core#"
PREFIX_OWL = "http://www.w3.org/2002/07/owl#"
PREFIX_XSD = "http://www.w3.org/2001/XMLSchema#"

RDF_type = PREFIX_RDF + "type"
RDF_first = PREFIX_RDF + "first"
RDF_rest = PREFIX_RDF + "rest"
RDF_nil = PREFIX_RDF + "nil"

QB_observation = PREFIX_CUBE + "observation"
QB_Observation = PREFIX_CUBE + "Observation"
QB_dataSet = PREFIX_CUBE + "dataSet"
QB_DataSet = PREFIX_CUBE + "DataSet"
QB_slice = PREFIX_CUBE + "slice"
QB_Slice = PREFIX_CUBE + "Slice"
QB_sliceKey = PREFIX_CUBE + "sliceKey"
QB_SliceKey = PREFIX_CUBE + "SliceKey"
QB_sliceStructure = PREFIX_CUBE + "sliceStructure"
QB_component = PREFIX_CUBE + "component"
QB_componentProperty = PREFIX_CUBE + "componentProperty"
QB_DimensionProperty = PREFIX_CUBE + "DimensionProperty"
QB_dimension = PREFIX_CUBE + "dimension"
QB_MeasureProperty = PREFIX_CUBE + "MeasureProperty"
QB_measure = PREFIX_CUBE + "measure"
QB_measureType = PREFIX_CUBE + "measureType"
QB_AttributeProperty = PREFIX_CUBE + "AttributeProperty"
QB_attribute = PREFIX_CUBE + "attribute"
QB_componentAttachment = PREFIX_CUBE + "componentAttachment"
QB_componentRequired = PREFIX_CUBE + "componentRequired"
QB_structure = PREFIX_CUBE + "structure"
QB_DataStructureDefinition = PREFIX_CUBE + "DataStructureDefinition"
QB_codeList = PREFIX_CUBE + "codeList"
QB_HierarchicalCodeList = PREFIX_CUBE + "HierarchicalCodeList"
QB_hierarchyRoot = PREFIX_CUBE + "hierarchyRoot"
QB_parentChildProperty = PREFIX_CUBE + "parentChildProperty"
QB_order = PREFIX_CUBE + "order"
QB_concept = PREFIX_CUBE + "concept"

RDFS_range = PREFIX_RDFS + "range"
SKOS_Concept = PREFIX_SKOS + "Concept"
SKOS_ConceptScheme = PREFIX_SKOS + "ConceptScheme"
SKOS_inScheme = PREFIX_SKOS + "inScheme"
SKOS_Collection = PREFIX_SKOS + "Collection"
SKOS_member = PREFIX_SKOS + "member"
OWL_inverseOf = PREFIX_OWL + "inverseOf"

XSD_boolean = PREFIX_XSD + "boolean"
XSD_integer = PREFIX_XSD + "integer"
XSD_decimal = PREFIX_XSD + "decimal"
XSD_double = PREFIX_XSD + "double"
XSD_string = PREFIX_XSD + "string"
XSD_date = PREFIX_XSD + "date"

# Lexical forms of the reference's LITERAL_TRUE / LITERAL_FALSE
# (ValidatorBase.java:369-372): Jena's typed-boolean lexical forms.
LEX_TRUE = "true"
LEX_FALSE = "false"
