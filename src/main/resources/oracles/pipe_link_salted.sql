SELECT * FROM (VALUES
(CAST('institution' AS VARCHAR),CAST('institution' AS VARCHAR),CAST(105 AS BIGINT),CAST(10 AS BIGINT)),
('__subj','person',1305,336),
('place','place',432,40),
('award','award',110,10),
('occupation','occupation',125,20),
('partner','person',104,97),
('employer','org',110,10)
) AS t("fe","etype","n","n_qids")