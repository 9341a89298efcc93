SELECT * FROM (VALUES
(CAST('institution' AS VARCHAR),CAST('institution' AS VARCHAR),CAST(104 AS BIGINT),CAST(10 AS BIGINT)),
('__subj','person',1264,336),
('award','award',126,10),
('place','place',364,40),
('occupation','occupation',96,20),
('partner','person',116,113),
('employer','org',125,10)
) AS t("fe","etype","n","n_qids")