SELECT * FROM (VALUES
(CAST('de' AS VARCHAR),CAST(20 AS BIGINT),CAST(19 AS BIGINT)),
('en',116,0),
('fr',10,100)
) AS t("lang","n_kept","min_doc")