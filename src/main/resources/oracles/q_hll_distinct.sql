SELECT * FROM (VALUES
(CAST('de' AS VARCHAR),CAST(72 AS BIGINT),CAST(19 AS BIGINT),CAST(70 AS BIGINT)),
('en',217,20,218),
('fr',66,19,64),
('es',71,20,73),
('zh',78,19,75)
) AS t("lang","approx_docs","approx_sources","exact_docs")